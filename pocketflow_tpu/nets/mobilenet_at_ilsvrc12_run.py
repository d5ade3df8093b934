"""Entry script for mobilenet_at_ilsvrc12 (parity with /root/reference/nets/mobilenet_at_ilsvrc12_run.py).

The reference gives each net its own tf.app.run() script; here every entry
delegates to the shared dispatcher with the model pre-selected:

    python -m pocketflow_tpu.nets.mobilenet_at_ilsvrc12_run [--learner=... flags]
"""

import sys


def main(argv=None):
    import main as dispatcher
    dispatcher.main(['--model=mobilenet_at_ilsvrc12'] + list(argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
