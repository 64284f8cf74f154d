"""Byte-deterministic PII / toxicity regex scrubbing.

Stage shape follows the reference's stateless string-kernel pattern
(token cleanup, /root/reference/cleanlab/internal/token_classification_utils.py:10-120)
— a pure ``map_batches`` over Arrow string arrays.

Determinism contract (north rule "exact per-turn text equality"):
a FIXED, ordered pattern list applied left-to-right with
``pyarrow.compute.replace_substring_regex`` (RE2). Patterns are kept in
the RE2 ∩ Python-`re` common subset so the pure-Python oracle
(``scrub_text_py``) is byte-identical — the test suite asserts this on
the planted-PII fixture corpus. Scrubbing is idempotent (replacement
tokens never match any pattern).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from cleanlab_ray.fixtures.transcripts import TOXIC_WORDS

# (name, pattern, replacement) — ORDER IS PART OF THE CONTRACT.
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("toxicity", r"(?i)\b(?:" + "|".join(TOXIC_WORDS) + r")\b", "[TOX]"),
]

# re.ASCII makes Python's \b an ASCII word boundary — RE2's semantics —
# so the oracle agrees with the engine on non-ASCII neighbors of PII
# (found by the hypothesis fuzzer: U+00B9 is \w in Unicode-re, not RE2).
_COMPILED_PY = [(re.compile(p, re.ASCII), r) for _, p, r in SCRUB_PATTERNS]


def scrub_array(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Vectorized scrub of an Arrow string column (engine path)."""
    for _, pattern, replacement in SCRUB_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern, replacement=replacement)
    return col


def scrub_text_py(text: str) -> str:
    """Pure-Python twin (oracle path) — must match ``scrub_array`` byte-for-byte."""
    for compiled, replacement in _COMPILED_PY:
        text = compiled.sub(replacement, text)
    return text


def scrub_batch(batch: pa.Table, text_col: str = "text", out_col: str = "scrubbed_text") -> pa.Table:
    """map_batches kernel: append the scrubbed column."""
    return batch.append_column(out_col, scrub_array(batch[text_col]))
