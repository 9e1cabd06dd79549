"""Deterministic, write-once materialization dirs for source-format
fixtures.

Several source queries demonstrate a READ path (JSON lines, CSV, ORC,
XML, schema-evolved parquet, binaryFile blobs) whose input has to be
materialized from the parquet corpus first — the write is fixture
construction, not the operator under test.  A fresh ``mkdtemp`` per
call (the original pattern) both leaks a directory per invocation and
re-pays the conversion on every oracle sweep / bench rep — the same
defect class ADVICE r8 flagged for the q_join_dpp layout.

This helper is the generalized fix (r9, introduced alongside the DPP
layout rework in ``operators/joins.py``):

* the directory is keyed by (kind, md5(corpus path)) — deterministic
  across sessions, collision-free across corpora;
* reuse is gated on a ``SOURCE`` fingerprint (corpus path + each input
  table's size/mtime_ns): the driver regenerates fixtures at the SAME
  path every round, so markers alone would serve stale data;
* the build lands in a pid-suffixed staging dir, the fingerprint
  (``_SOURCE`` — underscore-prefixed so Spark's data-source file
  listing ignores it inside a directory read) is written LAST, and one
  atomic ``os.rename`` publishes — a published
  dir is complete by construction (no reliance on per-format
  ``_SUCCESS`` markers, which multi-append builds rewrite mid-way);
* the whole check-build-publish section holds an exclusive ``flock``
  so concurrent builders serialize instead of racing.

Adoption is gated by the verification-window discipline: a query's
fixture path changes only in a round where the key is inside the
driver-checked window (q_source_evolving_schema converted r9; json/csv
due with their r10 slots, orc/xml/binaryfile with r11 — see SCALE.md).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def corpus_fingerprint(sf_dir: str, tables: list[str]) -> str:
    """Identity of a fixture's source data: corpus path + each input
    table's (size, mtime_ns)."""
    corpus = os.path.abspath(sf_dir)
    parts = [corpus]
    for t in tables:
        st = os.stat(os.path.join(corpus, f"{t}.parquet"))
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def materialized_fixture(
    kind: str,
    sf_dir: str,
    tables: list[str],
    build: Callable[[str], None],
) -> str:
    """Return the published fixture dir for (kind, corpus), building it
    exactly once per corpus state.  ``build(staging_dir)`` must write
    the complete fixture into the staging dir; it runs under the lock
    and only when no current fixture exists."""
    import fcntl

    corpus = os.path.abspath(sf_dir)
    fp = corpus_fingerprint(sf_dir, tables)
    out = os.path.join(
        tempfile.gettempdir(),
        f"aub_fix_{kind}_" + hashlib.md5(corpus.encode()).hexdigest()[:12],
    )

    def current() -> bool:
        try:
            with open(os.path.join(out, "_SOURCE")) as f:
                return f.read() == fp
        except OSError:
            return False

    if current():  # fast path: no lock for an already-published dir
        return out
    with open(out + ".lock", "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not current():
                tmp = f"{out}.tmp.{os.getpid()}"
                shutil.rmtree(tmp, ignore_errors=True)
                os.makedirs(tmp)
                build(tmp)
                # fingerprint last: a published dir is complete
                with open(os.path.join(tmp, "_SOURCE"), "w") as f:
                    f.write(fp)
                shutil.rmtree(out, ignore_errors=True)
                os.rename(tmp, out)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    return out
