"""Entry script for faster_rcnn_at_pascalvoc (parity with /root/reference/nets/faster_rcnn_at_pascalvoc_run.py).

The reference gives each net its own tf.app.run() script; here every entry
delegates to the shared dispatcher with the model pre-selected:

    python -m pocketflow_tpu.nets.faster_rcnn_at_pascalvoc_run [--learner=... flags]
"""

import sys


def main(argv=None):
    import main as dispatcher
    dispatcher.main(['--model=faster_rcnn_at_pascalvoc'] + list(argv or sys.argv[1:]))


if __name__ == '__main__':
    main()
