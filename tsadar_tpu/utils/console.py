"""Library diagnostics logger (stderr-backed).

Every informational message the framework emits while running (dewarp
status, fit-loop progress, skipped-species notes, ...) goes through
``log_info`` so that stdout stays machine-clean: the benchmark scripts
print exactly one JSON line there and are captured with ``> file`` by the
driver, and the reference's own CLI messages (e.g.
/root/reference/tsadar/utils/process/prepare.py prints) would otherwise
interleave with it.  Messages keep the reference's wording where parity
matters; only the stream changes.

The handler writes bare messages to stderr (no level/name prefixes) so
interactive output looks exactly like the reference's prints.  Callers
that want the standard ``logging`` machinery can configure the
``tsadar_tpu`` logger themselves before first use.
"""

import logging
import sys

logger = logging.getLogger("tsadar_tpu")
if not logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(_handler)
    logger.setLevel(logging.INFO)
    logger.propagate = False


def log_info(msg: str) -> None:
    """Emit a user-facing diagnostic line (stderr, not stdout)."""
    logger.info(msg)
