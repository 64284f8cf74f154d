"""Synthetic label-noise generation (benchmarking surface).

Re-expresses the contracts of the reference's
``cleanlab/benchmarking/noise_generation.py`` Ray-Data-first:

- ``noise_matrix_is_valid`` — learnability check
  (reference noise_generation.py:15-91).
- ``generate_n_rand_probabilities`` / ``distribute_balls`` — seeded
  helpers (reference noise_generation.py:340-475 contracts; own RNG
  stream, NOT a port of the reference's rejection loops).
- ``generate_noise_matrix_from_trace`` — K x K left-stochastic matrix
  with a given diagonal trace (reference noise_generation.py:175-338).
- ``generate_noisy_labels`` — flips labels so the induced
  (noisy, true) joint counts EXACTLY equal
  ``int(noise_matrix[j, k] * N_k)`` per off-diagonal cell, like the
  reference's count-exact flipping (noise_generation.py:93-172) — but
  distributed and deterministic: instead of ``np.random.choice`` on a
  driver-resident label vector, rows are ranked within their true
  class by a bijective 64-bit hash of their id and the first
  ``count_joint[j, k]`` ranks flip to each noisy class j (ascending).

Scale design for the distributed flip:

1. ONE aggregate pass builds a (K, num_bins) histogram of the hash's
   top bits per class — per-class counts fall out of the row sums, so
   no separate counting pass.
2. Boundary ranks (the cumulative flip counts) are located in their
   histogram bin; if a boundary bin holds > ``refine_threshold`` rows,
   ONE second-level histogram over the next 13 hash bits narrows it to
   an 8192x-smaller window first (same pattern as
   stages/decision.refine_boundary), keeping the driver pull at
   O(N / num_bins^2) rows at 10^12 scale.
3. One filtered pull fetches only boundary-window hashes; exact
   boundary hash values are order statistics inside that window.
4. One broadcast map pass assigns noisy labels by searchsorted against
   the per-class boundary values — no shuffle, no global sort.

The hash ``h(id) = ((id XOR salt) * 6364136223846793005) mod 2^64`` is
a bijection on the 64-bit domain (odd multiplier), so hashes are
unique whenever ids are unique and no tie-break is needed; the same
arithmetic is DuckDB-replicable via HUGEINT for SQL oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FLOATING_POINT_COMPARISON = 1e-6
HASH_MULT = 6364136223846793005  # odd => bijective multiply mod 2^64
HASH_SALT_BASE = 1442695040888963407
M64 = 1 << 64
DEFAULT_BINS = 8192  # top 13 bits of the hash
REFINE_THRESHOLD = 1 << 16


# ---------------------------------------------------------------------------
# Driver-side helpers (K x K scale — never touch row data)
# ---------------------------------------------------------------------------

def noise_matrix_is_valid(noise_matrix: np.ndarray, py: np.ndarray) -> bool:
    """Learnability check (reference noise_generation.py:15-91): the
    joint must be a probability matrix and every diagonal joint cell
    must exceed the product of its marginals."""
    noise_matrix = np.asarray(noise_matrix, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    k = len(py)
    ps = noise_matrix @ py  # P(label=i)
    joint = noise_matrix * py  # P(label=i, true=j)
    if abs(joint.sum() - 1.0) >= FLOATING_POINT_COMPARISON:
        return False
    for i in range(k):
        if not (ps[i] * py[i] < joint[i, i]):
            return False
    return True


def generate_n_rand_probabilities(
    n: int,
    m: float,
    rng: np.random.Generator,
    max_prob: float = 1.0,
    min_prob: float = 0.0,
) -> np.ndarray:
    """n random probabilities summing to m, each in [min_prob, max_prob]
    (contract of reference noise_generation.py:340-430; own sampler)."""
    if n == 0:
        return np.array([])
    if max_prob + FLOATING_POINT_COMPARISON < m / float(n):
        raise ValueError(f"max_prob={max_prob} < m/n={m / n}")
    if min_prob > (m + FLOATING_POINT_COMPARISON) / float(n):
        raise ValueError(f"min_prob={min_prob} > m/n={m / n}")
    result = rng.dirichlet(np.ones(n)) * m
    # redistribute mass from out-of-range entries; each step moves the
    # current max/min inside the band, so this terminates
    for _ in range(10_000):
        hi, lo = result.max(), result.min()
        if hi > max_prob + FLOATING_POINT_COMPARISON:
            excess = hi - max_prob
            result[np.argmax(result)] = max_prob
            result[np.argmin(result)] += excess
        elif lo < min_prob - FLOATING_POINT_COMPARISON:
            deficit = min_prob - lo
            result[np.argmin(result)] = min_prob
            result[np.argmax(result)] -= deficit
        else:
            break
    return result


def distribute_balls(
    n: int,
    k: int,
    rng: np.random.Generator,
    max_balls_per_bin: int | None = None,
    min_balls_per_bin: int = 0,
) -> np.ndarray:
    """N indistinguishable balls into K bins within per-bin bounds
    (contract of reference noise_generation.py:432-475)."""
    if k == 0:
        return np.zeros(0, dtype=np.int64)
    cap = k if max_balls_per_bin is None else max_balls_per_bin
    out = np.full(k, min_balls_per_bin, dtype=np.int64)
    remaining = n - min_balls_per_bin * k
    for _ in range(max(remaining, 0)):
        room = np.flatnonzero(out < cap)
        if len(room) == 0:
            break
        out[rng.choice(room)] += 1
    return out


def generate_noise_matrix_from_trace(
    k: int,
    trace: float,
    *,
    max_trace_prob: float = 1.0,
    min_trace_prob: float = 1e-5,
    max_noise_rate: float = 1 - 1e-5,
    min_noise_rate: float = 0.0,
    valid_noise_matrix: bool = True,
    py: np.ndarray | None = None,
    frac_zero_noise_rates: float = 0.0,
    seed: int = 0,
    max_iter: int = 10_000,
) -> np.ndarray | None:
    """K x K left-stochastic P(label=i | true=j) with diagonal sum
    ``trace`` (reference noise_generation.py:175-338 contract)."""
    if valid_noise_matrix and trace <= 1:
        raise ValueError(f"trace={trace}; trace > 1 required for a valid matrix")
    if valid_noise_matrix and py is None and k > 2:
        raise ValueError("py is required when valid_noise_matrix=True")
    if k <= 1:
        raise ValueError(f"K must be >= 2, got {k}")
    rng = np.random.default_rng(seed)
    if k == 2:
        diag = generate_n_rand_probabilities(2, trace, rng)
        return np.array([[diag[0], 1 - diag[1]], [1 - diag[0], diag[1]]])
    n_zero_target = int(k * (k - 1) * frac_zero_noise_rates)
    for _ in range(max_iter):
        nm = np.zeros((k, k))
        diag = generate_n_rand_probabilities(
            k, trace, rng, max_prob=max_trace_prob, min_prob=min_trace_prob
        )
        np.fill_diagonal(nm, diag)
        zeros_per_col = distribute_balls(
            n_zero_target, k, rng, max_balls_per_bin=k - 2
        )
        for col in range(k):
            num_noise = (k - 1) - int(zeros_per_col[col])
            if num_noise <= 0 or diag[col] >= 1.0:
                nm[:, col] = 0.0
                nm[col, col] = 1.0 if diag[col] >= 1.0 else nm[col, col]
                if diag[col] < 1.0 and num_noise <= 0:
                    # must place the residual mass somewhere: one cell
                    nm[col, col] = diag[col]
                    rows = [r for r in range(k) if r != col]
                    nm[rng.choice(rows), col] = 1 - diag[col]
                continue
            rates = generate_n_rand_probabilities(
                num_noise,
                1 - diag[col],
                rng,
                max_prob=max_noise_rate,
                min_prob=min_noise_rate,
            )
            rows = rng.choice(
                [r for r in range(k) if r != col], num_noise, replace=False
            )
            nm[rows, col] = rates
        if not valid_noise_matrix or noise_matrix_is_valid(nm, py):
            return nm
    return None


# ---------------------------------------------------------------------------
# Distributed exact-count label flipping
# ---------------------------------------------------------------------------

def _hash_ids(ids: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (ids.astype(np.uint64) ^ np.uint64(salt)) * np.uint64(HASH_MULT)


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _below_hi(h: np.ndarray, hi) -> np.ndarray:
    """Window upper-bound test: half-open [lo, hi) for interior bins,
    but the LAST histogram bin's count includes hash == 2^64-1, so its
    window (hi == u64 max) must be closed [lo, hi] to match."""
    hi = np.uint64(hi)
    m = h < hi
    if hi == _U64_MAX:
        m |= h == hi
    return m


def salt_for_seed(seed: int) -> int:
    return (HASH_SALT_BASE + 2 * seed) % M64  # keep salt parity stable


def _class_hist_aggfn(label_col: str, id_col: str, k: int, salt: int, num_bins: int):
    """(K * num_bins,) histogram of hash top bits per class; row sums
    give per-class counts, so one pass serves both needs."""
    from ray.data.aggregate import AggregateFn

    shift = np.uint64(64 - int(np.log2(num_bins)))

    def accumulate_block(acc, block: pa.Table):
        labels = np.asarray(block[label_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = _hash_ids(
            np.asarray(block[id_col].to_numpy(zero_copy_only=False), dtype=np.int64),
            salt,
        )
        bins = (h >> shift).astype(np.int64)
        out = np.asarray(acc, dtype=np.int64).copy()
        np.add.at(out, labels * num_bins + bins, 1)
        return out

    return AggregateFn(
        init=lambda _: np.zeros(k * num_bins, dtype=np.int64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.int64) + np.asarray(b, dtype=np.int64),
        name="class_hash_hist",
    )


def _window_hist_aggfn(
    label_col: str, id_col: str, windows: list, salt: int, num_bins: int
):
    """Second-level histograms: for each (class, h_lo, h_hi) window,
    a num_bins histogram of the hash offset inside the window."""
    from ray.data.aggregate import AggregateFn

    wins = [(int(c), np.uint64(lo), np.uint64(hi)) for c, lo, hi in windows]

    def accumulate_block(acc, block: pa.Table):
        labels = np.asarray(block[label_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = _hash_ids(
            np.asarray(block[id_col].to_numpy(zero_copy_only=False), dtype=np.int64),
            salt,
        )
        out = np.asarray(acc, dtype=np.int64).copy()
        for w, (c, lo, hi) in enumerate(wins):
            m = (labels == c) & (h >= lo) & _below_hi(h, hi)
            if not m.any():
                continue
            width = (hi - lo) // np.uint64(num_bins)
            sub = ((h[m] - lo) // width).astype(np.int64)
            np.clip(sub, 0, num_bins - 1, out=sub)
            np.add.at(out, w * num_bins + sub, 1)
        return out

    return AggregateFn(
        init=lambda _: np.zeros(len(wins) * num_bins, dtype=np.int64),
        accumulate_block=accumulate_block,
        merge=lambda a, b: np.asarray(a, dtype=np.int64) + np.asarray(b, dtype=np.int64),
        name="window_hash_hist",
    )


def count_joint_from_matrix(noise_matrix: np.ndarray, class_counts: np.ndarray) -> np.ndarray:
    """Exact off-diagonal flip counts: int(nm[j, k] * N_k).

    Algebraically the reference's ``(nm * py * N).astype(int)``
    (noise_generation.py:146-149) with the float round-trip
    ``(N_k / N) * N`` removed so SQL ``floor(nm * nk)`` reproduces it
    bit-for-bit."""
    k = len(noise_matrix)
    cj = np.zeros((k, k), dtype=np.int64)
    for kk in range(k):
        for j in range(k):
            if j != kk:
                cj[j, kk] = int(noise_matrix[j, kk] * float(class_counts[kk]))
    return cj


def generate_noisy_labels(
    ds,
    noise_matrix: np.ndarray,
    label_col: str = "label",
    id_col: str = "id",
    seed: int = 0,
    num_bins: int = DEFAULT_BINS,
    refine_threshold: int = REFINE_THRESHOLD,
    out_col: str = "noisy_label",
):
    """Distributed count-exact label flipping (see module docstring).

    Returns the input Dataset with ``out_col`` appended. Rows of true
    class k are ranked by the bijective id hash; the first
    ``count_joint[j, k]`` ranks flip to each noisy class j in
    ascending-j order, the rest keep k — so the induced joint counts
    equal ``count_joint_from_matrix`` EXACTLY, every run, under any
    partitioning."""
    noise_matrix = np.asarray(noise_matrix, dtype=np.float64)
    k = len(noise_matrix)
    salt = salt_for_seed(seed)
    shift = np.uint64(64 - int(np.log2(num_bins)))

    hist = np.asarray(
        ds.aggregate(_class_hist_aggfn(label_col, id_col, k, salt, num_bins))[
            "class_hash_hist"
        ],
        dtype=np.int64,
    ).reshape(k, num_bins)
    class_counts = hist.sum(axis=1)
    cj = count_joint_from_matrix(noise_matrix, class_counts)

    # boundary ranks per class: cumulative flip counts in ascending-j order
    boundaries = {}  # class -> list of (rank, target_class)
    for kk in range(k):
        r = 0
        entries = []
        for j in range(k):
            if j == kk or cj[j, kk] == 0:
                continue
            r += int(cj[j, kk])
            entries.append((r, j))
        boundaries[kk] = entries

    # locate each needed rank's histogram window
    cum = np.concatenate([np.zeros((k, 1), dtype=np.int64), np.cumsum(hist, axis=1)], axis=1)
    bin_width = np.uint64(M64 // num_bins)
    need = []  # (class, rank, h_lo, h_hi, rows_below_window)
    for kk, entries in boundaries.items():
        for rank, _j in entries:
            if rank >= class_counts[kk]:
                continue  # boundary beyond last row: bucket absorbs the tail
            b = int(np.searchsorted(cum[kk], rank + 1, side="left")) - 1
            lo = np.uint64(b) * bin_width
            hi = np.uint64(b + 1) * bin_width if b + 1 < num_bins else np.uint64(M64 - 1)
            if b + 1 >= num_bins:
                hi = np.uint64(0xFFFFFFFFFFFFFFFF)
            need.append([kk, rank, lo, hi, int(cum[kk][b])])

    # second-level refinement for oversized boundary bins
    fat = [t for t in need if _window_rows(hist, cum, t, num_bins) > refine_threshold]
    if fat:
        windows = [(t[0], t[2], t[3]) for t in fat]
        sub = np.asarray(
            ds.aggregate(
                _window_hist_aggfn(label_col, id_col, windows, salt, num_bins)
            )["window_hash_hist"],
            dtype=np.int64,
        ).reshape(len(windows), num_bins)
        for t, sh in zip(fat, sub):
            scum = np.concatenate([[0], np.cumsum(sh)])
            local = t[1] - t[4]
            sb = int(np.searchsorted(scum, local + 1, side="left")) - 1
            width = (t[3] - t[2]) // np.uint64(num_bins)
            new_lo = t[2] + np.uint64(sb) * width
            new_hi = t[2] + np.uint64(sb + 1) * width if sb + 1 < num_bins else t[3]
            t[4] = t[4] + int(scum[sb])
            t[2], t[3] = new_lo, new_hi

    # one filtered pull of boundary-window hashes
    boundary_vals = {kk: [] for kk in boundaries}
    if need:
        wins = [(int(t[0]), np.uint64(t[2]), np.uint64(t[3])) for t in need]

        def pull(batch: pa.Table) -> pa.Table:
            labels = np.asarray(
                batch[label_col].to_numpy(zero_copy_only=False), dtype=np.int64
            )
            h = _hash_ids(
                np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64),
                salt,
            )
            keep = np.zeros(len(labels), dtype=bool)
            for c, lo, hi in wins:
                keep |= (labels == c) & (h >= lo) & _below_hi(h, hi)
            return pa.table(
                {
                    "c": pa.array(labels[keep], type=pa.int64()),
                    "h": pa.array(h[keep], type=pa.uint64()),
                }
            )

        pulled = ds.map_batches(pull, batch_format="pyarrow").take_all()
        by_class: dict[int, list] = {}
        for row in pulled:
            by_class.setdefault(int(row["c"]), []).append(np.uint64(row["h"]))
        sorted_by_class = {c: np.sort(np.array(v, dtype=np.uint64)) for c, v in by_class.items()}
        for t in need:
            kk, rank, lo, hi, below = t
            vals = sorted_by_class.get(kk, np.array([], dtype=np.uint64))
            in_win = vals[(vals >= lo) & _below_hi(vals, hi)]
            boundary_vals[kk].append((rank, in_win[rank - below]))

    # assemble per-class (sorted boundary hashes, bucket targets) tables
    plan = {}
    for kk, entries in boundaries.items():
        vs, targets = [], []
        val_by_rank = dict(boundary_vals[kk])
        for rank, j in entries:
            targets.append(j)
            if rank >= class_counts[kk]:
                vs.append(np.uint64(0xFFFFFFFFFFFFFFFF))
            else:
                vs.append(val_by_rank[rank])
        targets.append(kk)  # tail bucket: unflipped
        plan[kk] = (np.array(vs, dtype=np.uint64), np.array(targets, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch[label_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = _hash_ids(
            np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64),
            salt,
        )
        noisy = labels.copy()
        for kk, (vs, targets) in plan.items():
            m = labels == kk
            if not m.any() or len(vs) == 0:
                continue
            idx = np.searchsorted(vs, h[m], side="right")
            noisy[m] = targets[idx]
        return batch.append_column(out_col, pa.array(noisy, type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _window_rows(hist, cum, t, num_bins: int) -> int:
    kk, rank, lo, hi, below = t
    b = int(lo // np.uint64(M64 // num_bins))
    return int(hist[kk][b])
