"""Entry script for lenet_at_cifar10 (parity with /root/reference/nets/lenet_at_cifar10_run.py).

The reference gives each net its own tf.app.run() script; here every entry
delegates to the shared dispatcher with the model pre-selected:

    python -m pocketflow_tpu.nets.lenet_at_cifar10_run [--learner=... flags]
"""

import sys


def main(argv=None):
    import main as dispatcher
    dispatcher.main(['--model=lenet_at_cifar10'] + list(argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
