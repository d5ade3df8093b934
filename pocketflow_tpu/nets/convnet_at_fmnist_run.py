"""Entry script for convnet_at_fmnist (parity with /root/reference/nets/convnet_at_fmnist_run.py).

The reference gives each net its own tf.app.run() script; here every entry
delegates to the shared dispatcher with the model pre-selected:

    python -m pocketflow_tpu.nets.convnet_at_fmnist_run [--learner=... flags]
"""

import sys


def main(argv=None):
    import main as dispatcher
    dispatcher.main(['--model=convnet_at_fmnist'] + list(argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
