"""Per-query source fingerprints — invalidate stale driver green rows.

Round-5 ADVICE: the driver rotation counted a query as "already
checked" based on a green correctness row from a round that graded
OLDER code — a query whose Spark path or oracle changed since kept its
green row and the ~50-query budget deprioritized re-verifying it.

The fix: fingerprint what each registry query actually executes —

- the query function's own source (inspect.getsource),
- its oracle SQL string,
- the full text of every package module the function's code references
  by leaf name (co_names ∩ module names — e.g. ``sorts``, ``text``,
  ``linkage``; ambiguous leaf names like ``windows``, which exists in
  both operators/ and streaming/, hash BOTH files: over-invalidation
  just re-verifies, under-invalidation hides a change).

``tools/query_hashes.json`` stores the fingerprint recorded at the
last LOCAL VERIFICATION (tools/parity_check.py updates it only for
queries that PASS). The rotation in __spark_entry__ treats a green
driver row whose stored fingerprint no longer matches the current one
as UNCHECKED, so changed implementations are fronted for the driver's
next correctness budget.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASH_FILE = os.path.join(os.path.dirname(_PKG), "tools", "query_hashes.json")

_SUBPACKAGES = ("operators", "sources", "streaming", "functions", "plans")


def _module_files() -> dict[str, list[str]]:
    """Leaf module name → all matching package files (a leaf name can
    exist in several subpackages; include every match)."""
    out: dict[str, list[str]] = {}
    for sub in _SUBPACKAGES:
        d = os.path.join(_PKG, sub)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".py") and fn != "__init__.py":
                out.setdefault(fn[:-3], []).append(os.path.join(d, fn))
    for fn in ("schemas.py", "tables.py", "caching.py", "session.py"):
        p = os.path.join(_PKG, fn)
        if os.path.exists(p):
            out.setdefault(fn[:-3], []).append(p)
    return out


_FILE_HASHES: dict[str, str] = {}


def _file_hash(path: str) -> str:
    h = _FILE_HASHES.get(path)
    if h is None:
        with open(path, "rb") as f:
            h = hashlib.sha256(f.read()).hexdigest()
        _FILE_HASHES[path] = h
    return h


def query_fingerprint(fn, oracle: str | None) -> str:
    """Fingerprint of one registry query's executable surface."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = getattr(fn, "__name__", repr(fn))
    parts = [src, oracle or ""]
    mods = _module_files()
    for ref in sorted(set(fn.__code__.co_names) & set(mods)):
        for path in mods[ref]:
            parts.append(_file_hash(path))
    return hashlib.sha256("\x00".join(parts).encode()).hexdigest()


def current_fingerprints() -> dict[str, str]:
    """Fingerprints for every registry query at the current source tree."""
    from .fixture_queries import QUERIES
    from .oracles import ORACLES

    return {
        name: query_fingerprint(fn, ORACLES.get(name))
        for name, fn in QUERIES.items()
    }


def load_recorded() -> dict[str, str]:
    """Fingerprints recorded at last local verification (empty if the
    file is missing/unreadable — everything then counts as unchanged,
    the pre-round-6 behavior)."""
    try:
        with open(HASH_FILE) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def record(names: list[str] | None = None) -> dict[str, str]:
    """Refresh stored fingerprints for ``names`` (all queries if None).
    Called by tools/parity_check.py for queries that PASS."""
    stored = load_recorded()
    current = current_fingerprints()
    for n in current if names is None else names:
        if n in current:
            stored[n] = current[n]
    stored = {k: stored[k] for k in sorted(stored)}
    with open(HASH_FILE, "w") as f:
        json.dump(stored, f, indent=1)
        f.write("\n")
    return stored
