"""Driver-faithful result canonicalization (shared by tests/conftest.py
and scripts/canon_sweep.py).

Reconstructed from the r1 driver failure tracebacks, the driver's
CORRECTNESS gate canonicalizes results as: ``toPandas()`` (Arrow), sort
columns by name, ``sort_values`` over all columns, then a TYPE-SENSITIVE
value hash. Three consequences every declared query must respect:

1. no out-of-ns-bounds timestamps (Arrow toPandas throws: year 9999
   sentinels are out);
2. no array/map/struct cells (pandas sort_values can't factorize
   numpy.ndarray) — serialize nested outputs to scalars;
3. int vs float must AGREE across engines ("5" != "5.0" under a value
   hash) — DuckDB widens integer sums to HUGEINT, which pandas renders as
   float64, so oracles must CAST sums back to BIGINT.

``canon_frame`` + ``frame_rows`` reproduce that pipeline so the local
gates fail exactly when the driver would.
"""

from __future__ import annotations

import datetime
import math


def _norm_value(v):
    """Normalize a non-numpy cell; numerics tag their type category so
    the compare is int/float-strict (mirrors the driver's value hash)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else v)
    if isinstance(v, datetime.datetime):
        # convert to UTC before dropping tzinfo — the same convention as
        # frame_rows' tz_convert(None), so a tz-aware datetime canonicalizes
        # identically on both paths
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("t", v.isoformat(sep=" "))
    if isinstance(v, datetime.date):
        # dates canonicalize to midnight so a Spark datetime.date matches
        # a DuckDB DATE that pandas upcast to a midnight Timestamp
        return ("t", v.isoformat() + " 00:00:00")
    import decimal

    if isinstance(v, decimal.Decimal):
        return _norm_value(float(v))
    return v


def canon_frame(pdf):
    """Driver-style canon: sorted columns, lexicographic row sort.

    Raises exactly where the driver's canon would (unsortable array
    cells), so keep the ``sort_values`` call even though ``frame_rows``
    re-sorts — the raise IS the check.
    """
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return pdf


def frame_rows(pdf):
    """Canonical, type-tagged row tuples of a pandas frame."""
    import numpy as np
    import pandas as pd

    out = []
    for tup in pdf.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is pd.NaT:
                row.append(None)
            elif isinstance(v, pd.Timestamp):
                ts = v.tz_convert(None) if v.tzinfo else v
                row.append(("t", ts.isoformat(sep=" ")))
            elif isinstance(v, (bool, np.bool_)):
                row.append(("b", bool(v)))
            elif isinstance(v, (int, np.integer)):
                row.append(("i", int(v)))
            elif isinstance(v, (float, np.floating)):
                f = float(v)
                row.append(("f", "NaN" if math.isnan(f) else f))
            else:
                row.append(_norm_value(v))
        out.append(tuple(row))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out
