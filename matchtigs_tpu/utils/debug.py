"""Debug-build invariant checks.

The reference guards its full-graph invariant scans with ``debug_assert!``
(compiled out of release builds, e.g.
/root/reference/src/implementation/mod.rs:319-390).  The analog here is the
``MATCHTIGS_DEBUG_CHECKS`` environment variable: off by default in
production (the two full-graph mirror verifications cost ~0.9s at 60M
bases and the consecutive-dummy scan builds a full in-CSR), forced on by
the test suite (tests/conftest.py) so every pipeline test still exercises
the invariants.
"""

from __future__ import annotations

import os


def debug_checks() -> bool:
    """True when expensive pipeline invariant asserts should run."""
    return os.environ.get("MATCHTIGS_DEBUG_CHECKS", "0").lower() not in (
        "0",
        "",
        "false",
        "off",
    )
