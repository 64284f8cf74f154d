"""Adversarial correctness sweeps — the round-5 campaign harness.

Re-runs the full registry-vs-DuckDB gate (scripts/check_correctness.py)
under hostile conditions the plain gate never exercises. Each sweep
either patches the engine's read path or synthesizes a derived corpus
under /tmp; the oracles always read the same files, so hash parity
remains the pass criterion (except where BASELINE.md documents a
convention scope: byte-vs-codepoint text hashing, null-as-empty text).

Usage:
    python scripts/adversarial_sweeps.py partition [K]   # repartition(K) after read
    python scripts/adversarial_sweeps.py shuffle         # random_shuffle(seed=7)
    python scripts/adversarial_sweeps.py blocksize       # 256 KiB target blocks
    python scripts/adversarial_sweeps.py empty|one|skew|unicode|nulls
                                                         # synthesized corpora
These found, in round 5: a float-precision bug in interval_join's band
shift, an empty-block schema crash in bloom_semijoin, order-dependent
ANN query derivation, ~20 empty-input crashes, null-group-key sort
crashes, and two INT32/INT64 overflows in oracle SQL.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_corpus(variant: str, src: str = "/root/testdata/sf0.01") -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"/tmp/sf_adv_{variant}"
    os.makedirs(out, exist_ok=True)

    def copy_all(skip=()):
        for t in TABLES:
            if t not in skip:
                pq.write_table(pq.read_table(f"{src}/{t}.parquet"),
                               f"{out}/{t}.parquet")

    def rewrite(t, **cols):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        d = {n: tbl[n] for n in tbl.column_names}
        for name, arr in cols.items():
            d[name] = pa.array(arr, type=tbl.schema.field(name).type)
        pq.write_table(pa.table(d), f"{out}/{t}.parquet")

    if variant in ("empty", "one"):
        n = 0 if variant == "empty" else 1
        for t in TABLES:
            tbl = pq.read_table(f"{src}/{t}.parquet")
            pq.write_table(tbl.slice(0, n), f"{out}/{t}.parquet")
    elif variant == "skew":
        copy_all(skip=("documents", "events", "embeddings"))
        d = pq.read_table(f"{src}/documents.parquet")
        ids, text = d["doc_id"].to_numpy(), d["text"].to_pylist()
        hot = "the quick brown fox jumps over the lazy dog again " * 3
        text = [hot if i % 2 == 0 else s for i, s in zip(ids, text)]
        rewrite("documents", text=text,
                n_chars=[len(s) for s in text])
        e = pq.read_table(f"{src}/events.parquet")
        uid = e["user_id"].to_numpy().copy()
        uid[e["event_id"].to_numpy() % 10 != 0] = 7
        rewrite("events", user_id=uid)
        m = pq.read_table(f"{src}/embeddings.parquet")
        vid, emb = m["vec_id"].to_numpy(), m["embedding"].to_pylist()
        emb0 = emb[int(np.nonzero(vid == 0)[0][0])]
        rewrite("embeddings",
                embedding=[emb0 if i % 10 < 3 else v for i, v in zip(vid, emb)])
    elif variant == "unicode":
        copy_all(skip=("documents",))
        d = pq.read_table(f"{src}/documents.parquet")
        ids, text = d["doc_id"].to_numpy(), d["text"].to_pylist()
        snips = [
            "naïve café résumé über älter œuvre",
            "Привет мир это тест кириллицы сегодня",
            "你好世界 这是一个测试 文本处理 引擎",
            "مرحبا بالعالم هذا اختبار للنص العربي",
            "İstanbul DİYARBAKIR ıssız IĞDIR",
            "emoji 😀🎉🚀 mixed with ascii words here",
            "ΣΊΣΥΦΟΣ σίσυφος GREEK final sigma ς test",
            "ﬁligree ﬂuent ligature ﬀ test words",
            "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ ｈｅｒｅ",
        ]
        text = [s + " | " + snips[i % len(snips)] for i, s in zip(ids, text)]
        rewrite("documents", text=text, n_chars=[len(s) for s in text])
    elif variant == "nulls":
        copy_all(skip=("documents", "events"))
        d = pq.read_table(f"{src}/documents.parquet")
        ids = d["doc_id"].to_numpy()
        text = [None if int(i) % 17 == 3 else s
                for i, s in zip(ids, d["text"].to_pylist())]
        lang = [None if int(i) % 23 == 5 else s
                for i, s in zip(ids, d["lang"].to_pylist())]
        rewrite("documents", text=text, lang=lang)
        e = pq.read_table(f"{src}/events.parquet")
        ev = e["event_id"].to_numpy()
        val = [None if int(i) % 19 == 7 else v
               for i, v in zip(ev, e["value"].to_pylist())]
        rewrite("events", value=val)
    else:
        raise SystemExit(f"unknown corpus variant {variant!r}")
    return out


def contract_run(sf_dir: str) -> int:
    """Empty-input contract over every registry query: a clean (empty)
    result or a loud ValueError passes; any other exception fails."""
    import pandas as pd
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    failures = 0
    for name, fn in e.queries().items():
        try:
            res = fn(sf_dir)
            if isinstance(res, pd.DataFrame):
                n = len(res)
            elif isinstance(res, pa.Table):
                n = res.num_rows
            else:
                n = res.count()
            print(f"OK   {name}: rows={n}")
        except ValueError as ex:
            print(f"OK   {name}: ValueError: {str(ex)[:90]}")
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:110]}")
            failures += 1
    ray.shutdown()
    print(f"\n{failures} failures")
    return failures


def main(argv: list[str]) -> int:
    import check_correctness as cc

    mode = argv[0] if argv else "partition"
    if mode in ("empty", "one"):
        # degenerate corpora are judged by the EMPTY-INPUT CONTRACT
        # (tests/test_empty_inputs.py): clean result or loud ValueError;
        # hash parity doesn't apply (SQL NULL/empty conventions differ)
        return contract_run(build_corpus(mode))
    if mode in ("skew", "unicode", "nulls"):
        return cc.main(build_corpus(mode))

    import cleanlab_ray.queries as Q

    orig_read = Q._read
    if mode == "partition":
        k = int(argv[1]) if len(argv) > 1 else 97
        Q._read = lambda sf, t, columns=None: orig_read(sf, t, columns).repartition(k)
        print(f"== sweep: repartition(K={k}) ==", flush=True)
    elif mode == "shuffle":
        Q._read = lambda sf, t, columns=None: orig_read(sf, t, columns).random_shuffle(seed=7)
        print("== sweep: random_shuffle(seed=7) ==", flush=True)
    elif mode == "blocksize":
        import ray

        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().target_max_block_size = 1 << 18
        print("== sweep: target_max_block_size=256KiB ==", flush=True)
    else:
        raise SystemExit(f"unknown sweep mode {mode!r}")
    return cc.main("/root/testdata/sf0.01")


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:]) else 0)
