"""Deterministic synthetic multi-turn transcript corpus (per FIXTURES.md §1-2).

Everything is regenerable from ``(seed, n_convs)`` — no external data.
Mirrors the reference's synthetic-noise test recipe (a valid noise matrix
with controlled trace, noisy labels sampled through it — semantics of
cleanlab/benchmarking/noise_generation.py:93-338) with transcript-shaped
payloads: multi-language text, planted quality defects, planted PII and
toxicity for the scrubber, Zipf-ish conversation lengths so a few
mega-conversations exercise salted groupby paths.

Classes (K=3): 0 = clean, 1 = low_quality, 2 = non_target_language.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

K = 3
CLASS_NAMES = ["clean", "low_quality", "non_target_language"]

# Small per-language vocabularies (public common words, fixed order).
EN_WORDS = (
    "the of and to in is you that it he was for on are as with his they at be this "
    "have from or one had by word but not what all were we when your can said there "
    "use an each which she do how their if will up other about out many then them "
    "these so some her would make like him into time has look two more write go see "
    "number no way could people my than first water been call who oil its now find"
).split()
DE_WORDS = (
    "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine "
    "als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch "
    "wie einem über einen so zum war haben nur oder aber vor zur bis mehr durch"
).split()
FR_WORDS = (
    "le de un être et à il avoir ne je son que se qui ce dans en du elle au pour "
    "pas vous par sur faire plus dire me on mon lui nous comme mais pouvoir avec "
    "tout y aller voir bien où sans tu ou leur homme si deux mari moi vouloir"
).split()
GIB_WORDS = (
    "zxqv blorp fnarg wubble snark grix plonk vreeb quux zort mimsy borogove "
    "frabjous slithy tove gyre gimble wabe jubjub bandersnatch vorpal tulgey"
).split()

TOXIC_WORDS = ["idiot", "moron", "stupid", "hateful", "scum", "trash"]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]

TS_BASE_US = 1_600_000_000 * 1_000_000  # fixed epoch base, microseconds


def noise_matrix_from_trace(k: int, trace: float, rng: np.random.Generator) -> np.ndarray:
    """A valid column-stochastic noise matrix P(label|true) with the given
    average trace (same contract as
    cleanlab/benchmarking/noise_generation.py:175-338; fresh implementation)."""
    diag = np.full(k, trace / k)
    diag += rng.uniform(-0.05, 0.05, size=k)
    diag = np.clip(diag, 0.55, 0.95)
    diag *= (trace / diag.sum()) if diag.sum() > 0 else 1.0
    diag = np.clip(diag, 0.5, 0.97)
    m = np.zeros((k, k))
    for j in range(k):
        off = rng.uniform(0.05, 1.0, size=k - 1)
        off = off / off.sum() * (1.0 - diag[j])
        col = np.insert(off, j, diag[j])
        m[:, j] = col
    return m


def _sample_words(rng: np.random.Generator, words: list[str], n: int) -> str:
    idx = rng.integers(0, len(words), size=n)
    return " ".join(words[i] for i in idx)


def _make_text(rng: np.random.Generator, true_label: int) -> str:
    if true_label == 0:  # clean English
        text = _sample_words(rng, EN_WORDS, int(rng.integers(6, 60)))
        r = rng.random()
        if r < 0.06:
            text += f" contact me at user{int(rng.integers(0, 9999))}@example.com"
        elif r < 0.10:
            text += f" call 555-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))}"
        elif r < 0.13:
            text += (
                f" ssn {int(rng.integers(100, 999))}-"
                f"{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}"
            )
        if rng.random() < 0.05:
            text += " you " + TOXIC_WORDS[int(rng.integers(0, len(TOXIC_WORDS)))]
        return text
    if true_label == 1:  # low quality
        mode = rng.random()
        if mode < 0.2:
            return ""
        if mode < 0.5:
            w = EN_WORDS[int(rng.integers(0, len(EN_WORDS)))]
            return " ".join([w] * int(rng.integers(8, 40)))
        if mode < 0.8:
            syms = "#$%@!&*^~|<>{}[]"
            return "".join(syms[i] for i in rng.integers(0, len(syms), size=int(rng.integers(20, 80))))
        return _sample_words(rng, EN_WORDS, int(rng.integers(1, 3)))
    # non-target language
    mode = rng.random()
    if mode < 0.4:
        return _sample_words(rng, DE_WORDS, int(rng.integers(6, 50)))
    if mode < 0.8:
        return _sample_words(rng, FR_WORDS, int(rng.integers(6, 50)))
    return _sample_words(rng, GIB_WORDS, int(rng.integers(6, 40)))


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    avg_trace: float = 0.8,
    max_turns: int = 512,
    with_pred_probs: bool = True,
    conv_offset: int = 0,
) -> pa.Table:
    """Build the transcript table (shuffled row order, per FIXTURES.md).

    Columns: conv_id, turn_idx, role, text, tool, ts, true_label,
    label (noisy, through the seeded noise matrix), and optionally
    pred_probs (fixed_size_list<float32>[K], softmax of noisy logits
    centered on true_label) for the pure-math operators.
    """
    rng = np.random.default_rng(seed)
    noise = noise_matrix_from_trace(K, avg_trace * K, rng)

    # Zipf-truncated turns per conversation (a few mega-conversations).
    raw = rng.zipf(1.7, size=n_convs)
    n_turns = np.clip(raw, 1, max_turns).astype(np.int64)
    total = int(n_turns.sum())

    conv_ids = np.repeat(
        [f"c{i + conv_offset:08d}" for i in range(n_convs)], n_turns
    )
    turn_idx = np.concatenate([np.arange(t, dtype=np.int32) for t in n_turns])
    conv_ordinal = np.repeat(np.arange(n_convs), n_turns)

    role_idx = turn_idx % 3
    roles = np.array(ROLES, dtype=object)[role_idx]
    tools = np.where(
        role_idx == 2,
        np.array(TOOLS, dtype=object)[rng.integers(0, len(TOOLS), size=total)],
        None,
    )
    ts = TS_BASE_US + conv_ordinal * 3_600_000_000 + turn_idx.astype(np.int64) * 1_000_000

    true_labels = rng.choice(K, size=total, p=[0.70, 0.15, 0.15]).astype(np.int32)
    texts = [_make_text(rng, int(t)) for t in true_labels]

    # Noisy labels through the noise matrix: label ~ noise[:, true]
    u = rng.random(total)
    cum = np.cumsum(noise, axis=0)  # (K label, K true): per-true-class CDF over labels
    noisy = (u[:, None] > cum.T[true_labels]).sum(axis=1).astype(np.int32)

    cols: dict[str, pa.Array] = {
        "conv_id": pa.array(conv_ids, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.large_string()),
        "tool": pa.array(tools.tolist(), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "true_label": pa.array(true_labels, type=pa.int32()),
        "label": pa.array(noisy, type=pa.int32()),
    }

    if with_pred_probs:
        logits = rng.normal(0.0, 1.0, size=(total, K)).astype(np.float64)
        logits[np.arange(total), true_labels] += 2.0
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = (e / e.sum(axis=1, keepdims=True)).astype(np.float32)
        cols["pred_probs"] = pa.FixedSizeListArray.from_arrays(
            pa.array(probs.reshape(-1)), K
        )

    table = pa.table(cols)
    # Shuffled row order so tests must re-establish stable turn ordering.
    perm = rng.permutation(total)
    return table.take(pa.array(perm))


def write_transcripts(
    out_dir: str,
    n_convs: int = 100,
    seed: int = 42,
    rows_per_file: int = 200_000,
    **kwargs,
) -> str:
    """Write the corpus as a directory of parquet files (deterministic)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    table = generate_transcripts(n_convs=n_convs, seed=seed, **kwargs)
    n = table.num_rows
    part = 0
    for start in range(0, n, rows_per_file):
        chunk = table.slice(start, rows_per_file)
        pq.write_table(chunk, os.path.join(out_dir, f"part-{part:05d}.parquet"))
        part += 1
    return out_dir


def write_transcripts_parallel(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    shards: int = 16,
    **kwargs,
) -> str:
    """Generate a large corpus as ``shards`` deterministic Ray tasks
    (shard i seeds its own RNG with seed+i and owns a disjoint conv_id
    range, so output is independent of shard count only per-shard)."""
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    per = n_convs // shards

    @ray.remote
    def _gen(i: int) -> str:
        import pyarrow.parquet as pq

        count = per if i < shards - 1 else n_convs - per * (shards - 1)
        table = generate_transcripts(
            n_convs=count, seed=seed + i, conv_offset=i * per, **kwargs
        )
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(table, path)
        return path

    ray.get([_gen.remote(i) for i in range(shards)])
    return out_dir
