"""Schema-metadata parameter stamps for persisted index artifacts.

Both persisted-index families carry their build parameters in a column's
field metadata (parquet round-trips Spark schema metadata), so a probe or
an append whose parameters disagree with the index it touches fails FAST
instead of silently producing garbage — empty LSH buckets (every doc
self-keeps) or codes joined against the wrong codewords (wrong distances,
no error). This module is the single implementation of the check;
operators/minhash.py and operators/ivfpq.py each wrap it with their field
name, stamp keys, and failure-consequence text, so the contract below
cannot drift between families (r13 review finding).

Contract — all-keys-or-nothing: a missing or PARTIAL stamp (the caller
projected / re-aliased the column) is uncheckable and passes; only a
complete stamp that disagrees raises. A partially-present stamp can
therefore never KeyError, and pre-stamp frames stay accepted.

Search-side checks compare a SUBSET of the stamp (``compare_keys``):
ivfpq_topk validates only (m, dim) because k is a build parameter that
lives in the codebook, not a search argument — but stamp PRESENCE is
still all-keys-or-nothing over the full key set, so a frame stamped by
an older writer with fewer keys stays uncheckable rather than
half-checked (r13 ADVICE: the search-side copy of this logic had
drifted into ivfpq.py; this parameter is what lets it delegate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def check_stamp(
    frame: DataFrame,
    field: str,
    stamp_keys: Sequence[str],
    label: str,
    expected: tuple,
    caller: str,
    consequence: str,
    compare_keys: Sequence[str] | None = None,
) -> None:
    """Raise ValueError if ``frame``'s ``field`` carries a complete
    parameter stamp (every key in ``stamp_keys`` present in the field
    metadata) that disagrees with ``expected``. ``label`` names the
    parameter tuple in the message (e.g. "(num_hashes, bands, seed)");
    ``consequence`` states what the mismatch would silently do.

    ``compare_keys`` (default: all of ``stamp_keys``) selects which
    stamped values are compared against ``expected`` — presence is
    always judged on the FULL ``stamp_keys`` set (all-or-nothing), the
    comparison on the subset. ``expected`` must align positionally with
    ``compare_keys``."""
    try:
        meta = frame.schema[field].metadata or {}
    except KeyError:  # caller projected/renamed the column — can't check
        meta = {}
    if all(k in meta for k in stamp_keys):
        built = tuple(meta[k] for k in (compare_keys or stamp_keys))
        if built != tuple(expected):
            raise ValueError(
                f"{caller}: {label}={tuple(expected)} does not match the "
                f"index's build parameters {built}; {consequence}"
            )
