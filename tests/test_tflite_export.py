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
