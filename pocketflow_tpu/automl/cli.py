"""AutoML CLI: hyper-parameter search over learner runs.

Rebuild of the reference's L8 entry (/root/reference/run.sh + automl/): the
reference submits one cluster job per GP-proposed flag set and greps the
objective from logs; here trials run in-process under `FLAGS.scope`.

    python -m pocketflow_tpu.automl.cli --model=convnet_at_fmnist \
        --learner=weight-sparse --automl_nb_trials=20 --automl_algo=GP \
        --synthetic_data --nb_epochs_rat=0.01

The search space defaults to the reference's WS space (automl.yaml
param_conf); pass --automl_space as 'name:type:min:max,...' to override.
"""

from __future__ import annotations

import importlib
import json
import sys


def parse_space(spec: str):
    from pocketflow_tpu.automl.search import ParamSpec
    specs = []
    for part in spec.split(','):
        name, ptype, lo, hi = part.split(':')
        specs.append(ParamSpec(name, ptype.upper(), float(lo), float(hi)))
    return specs


def main(argv=None):
    from pocketflow_tpu.utils.devices import honor_jax_platforms
    honor_jax_platforms()
    import pocketflow_tpu  # noqa: F401
    from pocketflow_tpu.automl import search as search_lib
    from pocketflow_tpu.config import FLAGS
    from pocketflow_tpu.core.metrics import get_logger

    FLAGS.DEFINE_integer('automl_nb_trials', 20, 'AutoML: number of trials')
    FLAGS.DEFINE_string('automl_algo', 'GP', "AutoML: 'GP' | 'TPE' | 'random'")
    FLAGS.DEFINE_string('automl_space', '',
                        "AutoML: 'name:type:min:max,...' (default: WS space)")
    FLAGS.DEFINE_string('automl_output', './automl_result.json',
                        'AutoML: result file')
    try:
        from main import MODELS
    except ImportError:
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.getcwd())
        from main import MODELS
    FLAGS.DEFINE_string('model', 'convnet_at_fmnist',
                        'model helper: ' + ' | '.join(sorted(MODELS)))
    FLAGS.parse_args(argv)
    log = get_logger()
    # path.conf data dirs apply to AutoML trials too (else real-data users
    # silently search over the synthetic fallback)
    from pocketflow_tpu.utils.path_args import apply_path_conf
    apply_path_conf(FLAGS.model)

    specs = (parse_space(FLAGS.automl_space) if FLAGS.automl_space
             else search_lib.WS_SEARCH_SPACE)
    module = importlib.import_module(MODELS[FLAGS.model])

    def objective(params):
        from pocketflow_tpu.learners import create_learner
        learner = create_learner(None, module.ModelHelper())
        state = learner.train()
        metrics = learner.evaluate() if hasattr(learner, 'evaluate') else {}
        return float(metrics.get('accuracy', 0.0))

    best, best_obj, history = search_lib.run_automl(
        objective, specs, nb_trials=FLAGS.automl_nb_trials,
        algo=FLAGS.automl_algo, seed=FLAGS.rand_seed,
        constraint_fn=search_lib.ws_constraint)
    with open(FLAGS.automl_output, 'w') as fout:
        json.dump({'best_params': best, 'best_objective': best_obj,
                   'history': [(p, o) for p, o in history]}, fout, indent=2)
    log.info('AutoML done: best=%.4f params=%s -> %s',
             best_obj, best, FLAGS.automl_output)


if __name__ == '__main__':
    main(sys.argv[1:])
