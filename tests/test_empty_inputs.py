"""Empty-input contract: every registry query, pointed at a corpus
whose tables all have ZERO rows (the daily-empty-delta shape), must
either complete with an empty/defined result or raise ValueError with
a clear message — never an incidental KeyError / IndexError /
TypeError / AttributeError from deep inside a kernel."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_empty_input_contract(ray_session, empty_sf_dir):
    import __ray_entry__ as e

    bad = {}
    for name, fn in e.queries().items():
        try:
            res = fn(empty_sf_dir)
            if isinstance(res, pd.DataFrame):
                n = len(res)
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = res.count()
            if n != 0:
                # a few summaries legitimately emit fixed-shape rows
                # (e.g. per-class tables) — they must still be finite
                # and small, not fabricated data rows
                if n > 64:
                    bad[name] = f"returned {n} rows from empty input"
        except ValueError:
            pass  # loud, typed refusal is part of the contract
        except Exception as ex:  # noqa: BLE001
            bad[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
    assert not bad, f"{len(bad)} queries break the empty-input contract: {bad}"


def test_null_group_keys(ray_session, tmp_path):
    """Null GROUP keys (lang) must form their own group — Ray's sort
    exchange cannot compare None with str, so the kernels route nulls
    through a sentinel and restore them on emit (previously: TypeError
    deep inside ray::map)."""
    import numpy as np
    import ray.data as rd

    from cleanlab_ray.stages.sketches import distinct_tokens_by

    tbl = pa.table({
        "lang": pa.array(["en", None, "en", None, "de"]),
        "text": pa.array(["a b", "c d e", "a f", "c", "g h"]),
    })
    out = distinct_tokens_by(rd.from_arrow(tbl).repartition(3), "lang",
                             k=64).to_pandas()
    got = {(r["lang"] if pd.notna(r["lang"]) else None): r["distinct_tokens"]
           for _, r in out.iterrows()}
    assert got == {"en": 3, None: 3, "de": 2}
