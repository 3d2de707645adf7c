"""CLI for the real-weight verification gate (indextts_tpu/verify.py).

One command to run when reference checkpoints land:

  ./run.sh verify-weights <model_dir> [--prompt p.wav] [--asr-cmd "..."]
  ./run.sh verify-weights --dry-run        # in-image rehearsal, no weights

Converts the ``.pth`` files (strict key mapping via io/checkpoint.py), runs
the reference's 11-case regression battery (tests/regression_test.py:4-42),
and reports speaker-sim (+WER/CER with an external ASR) as one JSON line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from indextts_tpu.verify import main  # noqa: E402

if __name__ == "__main__":
    main()
