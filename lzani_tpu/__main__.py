import os
import sys

from .cli import main

if __name__ == "__main__":
    rc = main()
    # A hybrid run may leave the device warm-up daemon thread inside a
    # long runtime call (program load takes minutes on some backends);
    # normal interpreter teardown then aborts in C++ ("terminate called
    # ..."). All outputs are already written and closed — exit without
    # running teardown.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
