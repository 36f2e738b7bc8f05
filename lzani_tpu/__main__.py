import sys

from .cli import main

if __name__ == "__main__":
    # A hybrid run's still-pending device warm-up thread is joined by the
    # scheduler's atexit hook (ops/hybrid.py:_join_parked_warm), so normal
    # interpreter teardown is safe.
    sys.exit(main())
