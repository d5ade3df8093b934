"""TFLite export path: convert, numeric self-check, quantized variants,
latency protocol (reference export_pb_tflite_models.py / calc_inference_time).
"""

import numpy as np
import pytest

pytest.importorskip('tensorflow')

import jax  # noqa: E402


@pytest.fixture(scope='module')
def small_model():
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    # module-scoped: runs outside the conftest flag fixture, so pin the
    # dtype explicitly (TFLite builtins are fp32; bf16 does not legalize)
    with FLAGS.scope(synthetic_data=True, compute_dtype='float32'):
        helper = ModelHelper()
        model = helper.create_model()
        images = np.random.default_rng(0).random((2, 28, 28, 1)) \
            .astype(np.float32)
        variables = helper.init_model(jax.random.PRNGKey(0), images)
    return model, variables, images


def test_tflite_float_parity_and_artifact(small_model, tmp_path):
    from pocketflow_tpu.tools import export_tflite as tfl
    model, variables, images = small_model
    out = tfl.export_tflite(model, variables, images,
                            str(tmp_path / 'model'), quantize='none')
    assert out.endswith('.tflite')
    with open(out, 'rb') as fin:
        blob = fin.read()
    got = tfl.run_tflite(blob, images)
    ref = np.asarray(model.apply(variables, images, train=False))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_tflite_dynamic_quant_shrinks_weights(small_model):
    from pocketflow_tpu.tools import export_tflite as tfl
    model, variables, images = small_model
    blob_f = tfl.convert_to_tflite(model, variables, images, quantize='none')
    blob_d = tfl.convert_to_tflite(model, variables, images,
                                   quantize='dynamic')
    # int8 weight storage: the dominant dense kernel shrinks ~4x
    assert len(blob_d) < 0.5 * len(blob_f)
    got = tfl.run_tflite(blob_d, images)
    ref = np.asarray(model.apply(variables, images, train=False))
    spread = float(ref.max() - ref.min()) + 1e-6
    assert float(np.max(np.abs(got - ref))) < 0.25 * spread


def test_tflite_full_int8_uint8_input(small_model):
    import tensorflow as tf
    from pocketflow_tpu.tools import export_tflite as tfl
    model, variables, images = small_model
    blob = tfl.convert_to_tflite(model, variables, images, quantize='int8',
                                 input_uint8=True)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    assert interp.get_input_details()[0]['dtype'] == np.uint8
    got = tfl.run_tflite(blob, images)
    assert got.shape == (2, 10)
    assert np.all(np.isfinite(got))


def test_saved_model_export(small_model, tmp_path):
    import tensorflow as tf
    from pocketflow_tpu.tools import export_tflite as tfl
    model, variables, images = small_model
    out = tfl.export_saved_model(model, variables, images,
                                 str(tmp_path / 'saved'))
    restored = tf.saved_model.load(out)
    got = np.asarray(restored.serve(tf.constant(images)))
    ref = np.asarray(model.apply(variables, images, train=False))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tflite_rejects_bf16_models():
    """bf16 models must fail with the clear rebuild-as-f32 error, not a
    cryptic converter legalization failure."""
    import jax.numpy as jnp
    from pocketflow_tpu.nets.mobilenet import MobileNetV1
    from pocketflow_tpu.tools import export_tflite as tfl
    model = MobileNetV1(nb_classes=10, dtype=jnp.bfloat16)
    x = np.random.default_rng(0).random((1, 32, 32, 3)).astype(np.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x,
                                           train=False))()
    with pytest.raises(ValueError, match='bfloat16'):
        tfl.convert_to_tflite(model, variables, x)


def test_tflite_latency_protocol(small_model):
    from pocketflow_tpu.tools import export_tflite as tfl
    model, variables, images = small_model
    blob = tfl.convert_to_tflite(model, variables, images, quantize='none')
    res = tfl.measure_latency(blob, nb_warmup=2, nb_timed=5)
    assert res['mean_ms'] > 0.0 and res['p50_ms'] > 0.0


def test_qat_deploy_fold_quantizes_listed_weights():
    """The deploy forward's weight fold must actually fire: qat_spec's
    weight_paths are MODULE paths while params leaves are '<module>/kernel'
    (the round-3 review found the mismatch left weights unfolded), and the
    fold must use the SPEC's bit width, not the process's current flags."""
    import jax.numpy as jnp
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    from pocketflow_tpu.ops import fake_quant as fq
    from pocketflow_tpu.tools import export_tflite as tfl

    with FLAGS.scope(synthetic_data=True, compute_dtype='float32',
                     rand_seed=0, batch_size=4, nb_smpls_train=64,
                     nb_smpls_eval=64):
        helper = ModelHelper()
        model = helper.create_model()
        sample = jnp.asarray(np.random.default_rng(0).random(
            (2,) + helper.dataset_train.spec.image_shape), jnp.float32)
        variables = helper.init_model(jax.random.PRNGKey(0), sample)
        kernels = [p for p in _leaf_paths(variables['params'])
                   if p.endswith('/kernel')]
        modules = [p[:-len('/kernel')] for p in kernels]
        spec = {'weight_paths': modules,
                'act_min': np.zeros(0, np.float32),
                'act_max': np.zeros(0, np.float32),
                'weight_bits': 4, 'act_bits': 8}
        # flags deliberately differ from the spec: the spec must win
        with FLAGS.scope(uqtf_weight_bits=8, uqtf_activation_bits=8):
            deploy_fwd, qat_ref = tfl.build_qat_deploy_forward(
                model, variables, spec)
        folded = deploy_fwd.__closure__  # noqa: F841 (fold happens eagerly)
        out_deploy = np.asarray(jax.device_get(deploy_fwd(sample)))
        out_ref = np.asarray(jax.device_get(qat_ref(sample)))
        # with no act sites, deploy (folded weights) == QAT reference
        # (policy-quantized weights) exactly — both on the 4-bit grid
        np.testing.assert_allclose(out_deploy, out_ref, atol=1e-5)
        # and the fold genuinely changed the function vs the float model
        out_float = np.asarray(jax.device_get(
            model.apply(jax.device_get(variables), sample, train=False)))
        assert float(np.abs(out_deploy - out_float).max()) > 1e-4


def _leaf_paths(tree):
    from pocketflow_tpu.learners.weight_sparsification import masking
    paths = []
    jax.tree_util.tree_map_with_path(
        lambda p, _: paths.append(masking.path_str(p)), tree)
    return paths


@pytest.mark.slow
def test_int8_qat_export_carries_trained_ranges(tmp_path):
    """VERDICT r2 #2: the int8 artifact must reproduce the QAT eval path,
    not a PTQ re-calibration of the float model.  Trains a tiny uqtf
    learner, TIGHTENS its activation ranges (so the trained ranges visibly
    clip the function), and asserts the int8 interpreter follows the QAT
    forward while diverging from the float forward."""
    import jax.numpy as jnp
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.learners import create_learner
    from pocketflow_tpu.nets.convnet_at_fmnist import ModelHelper
    from pocketflow_tpu.tools import export_tflite as tfl
    with FLAGS.scope(synthetic_data=True, compute_dtype='float32',
                     rand_seed=0, batch_size=8, batch_size_eval=32,
                     nb_smpls_train=512, nb_smpls_eval=128,
                     nb_epochs_rat=0.2, lrn_rate_init=0.05,
                     uql_quant_epochs=10, uqtf_quant_delay=0,
                     summ_step=10**6, save_step=10**6,
                     save_path=str(tmp_path / 'models' / 'model.ckpt'),
                     uqtf_save_path=str(tmp_path / 'uqtf' / 'model.ckpt'),
                     log_dir=str(tmp_path / 'logs')):
        create_learner(None, ModelHelper(), learner_name='full-prec').train()
        learner = create_learner(None, ModelHelper(), learner_name='uniform-tf')
        state = learner.train()
        # tighten ranges: the QAT function must now clip hard
        extra = jax.device_get(state.extra)
        state = state.replace(extra={
            'act_min': jnp.asarray(extra['act_min']),
            'act_max': jnp.asarray(np.minimum(np.asarray(extra['act_max']),
                                              0.8))})
        qat_spec = learner.export_quant_spec(state)

        it = learner.dataset_eval.build()
        batch = next(it)
        sample = np.asarray(jax.device_get(learner.dataset_eval.augment(
            jnp.asarray(batch['image']), jax.random.PRNGKey(0), False)),
            np.float32)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        _, qat_ref = tfl.build_qat_deploy_forward(learner.model, variables,
                                                  qat_spec)
        ref_qat = np.asarray(jax.device_get(jax.jit(qat_ref)(sample)))
        ref_float = np.asarray(jax.device_get(jax.jit(
            lambda x: learner.model.apply(jax.device_get(variables), x,
                                          train=False))(sample)))
        clip_effect = float(np.abs(ref_qat - ref_float).max())
        assert clip_effect > 0.5, clip_effect  # the ranges genuinely bite

        path = tfl.export_tflite(learner.model, variables, sample,
                                 str(tmp_path / 'model_qat'),
                                 quantize='int8', qat_spec=qat_spec)
        with open(path, 'rb') as fin:
            out = tfl.run_tflite(fin.read(), sample)
        d_qat = float(np.abs(out - ref_qat).max())
        d_float = float(np.abs(out - ref_float).max())
        scale = float(np.abs(ref_qat).max())
        # faithful to the TRAINED quantization: close to QAT eval, far from
        # the float model (which a range-discarding PTQ export would track)
        assert d_qat < 0.05 * scale + 0.05, (d_qat, scale)
        assert d_float > 5 * d_qat, (d_float, d_qat)
        assert (out.argmax(-1) == ref_qat.argmax(-1)).mean() == 1.0
