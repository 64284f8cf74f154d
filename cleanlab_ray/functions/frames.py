"""Driver-side frame collection helpers.

``Dataset.to_pandas()`` returns a COLUMN-LESS DataFrame whenever the
dataset has zero rows — even when every block carries a typed empty
schema — so any driver code that indexes the result by column name
crashes with an incidental KeyError on an empty corpus (the
daily-empty-delta shape). ``typed_pandas`` keeps the frame typed.
"""

from __future__ import annotations

import pandas as pd


def typed_pandas(ds, columns: dict[str, object]) -> pd.DataFrame:
    """``ds.to_pandas()``, but an all-empty Dataset comes back as a
    TYPED empty frame with the given ``{name: dtype}`` columns instead
    of a column-less one. ``columns`` states the schema the caller is
    about to index — it is only consulted when the dataset is empty."""
    df = ds.to_pandas()
    if len(df) == 0 and len(df.columns) == 0:
        df = pd.DataFrame({c: pd.Series(dtype=t) for c, t in columns.items()})
    return df
