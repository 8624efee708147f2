"""Deterministic synthetic transcript fixtures (FIXTURES.md, seed=42).

The engine's analogue of the reference's fixture corpus
(``samples/snv.vcf.gz`` 5,462 rows / ``samples/cnv.vcf.gz`` 4 rows,
``converter/convert_test.go:15-22``): a dense primary table, a tiny edge
table, and a skew table the reference lacks. numpy ``default_rng(42)`` only.

Schema is exactly BASELINE.json ``input_hint``:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp[us]) — all non-null, mirroring the reference's all-``required``
schema (``converter/schema.go:21-38``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

ROLES = np.array(["user", "assistant", "tool", "system"], dtype=object)
ROLE_P = np.array([0.40, 0.40, 0.15, 0.05])
TOOLS = np.array(
    ["search", "browser", "python", "bash", "calculator", "sql",
     "file_read", "file_write", "http_get", "summarize", "translate", "ocr"],
    dtype=object,
)
UTF8_SNIPPET = "héllo 世界 🙂"

ARROW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=False),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)


def _vocab(rng: np.random.Generator) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(512):
        n = int(rng.integers(3, 10))
        words.append("".join(rng.choice(letters, n)))
    return np.array(words, dtype=object)


# conversational sentence templates: transcript text is template-heavy in
# reality (agent phrasing, tool scaffolding), which is exactly the workload
# FSST-style symbol tables target; slots keep rows distinct
_TEMPLATES = [
    ("I checked the ", " configuration and found ", " matching entries."),
    ("Please run the ", " step again with ", " retries enabled."),
    ("The ", " service returned status ", " after the last deploy."),
    ("Let me look at the ", " logs for request ", " now."),
    ("Based on the ", " output, I recommend increasing ", " slightly."),
    ("The error in ", " was caused by a missing ", " parameter."),
    ("I updated the ", " settings to use ", " as the default."),
    ("Searching the ", " index for ", " related documents."),
    ("The user asked about ", " so I summarized the ", " section."),
    ("That matches the ", " pattern we saw in ticket ", " earlier."),
    ("I will schedule the ", " job to process batch ", " overnight."),
    ("The metrics for ", " show a spike around ", " yesterday."),
]


def _gen_text(rng: np.random.Generator, total: int, vocab: np.ndarray) -> np.ndarray:
    """Templated sentences, 1..5 per turn — vectorized draws, one join pass."""
    n_sent = rng.integers(1, 6, total)
    total_sent = int(n_sent.sum())
    tid = rng.integers(0, len(_TEMPLATES), total_sent)
    w1 = rng.choice(vocab, total_sent)
    w2 = rng.integers(0, 100000, total_sent)
    p0 = np.array([t[0] for t in _TEMPLATES], dtype=object)
    p1 = np.array([t[1] for t in _TEMPLATES], dtype=object)
    p2 = np.array([t[2] for t in _TEMPLATES], dtype=object)
    sents = p0[tid] + w1 + p1[tid] + w2.astype(str).astype(object) + p2[tid]
    bounds = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_sent, out=bounds[1:])
    return np.array(
        [" ".join(sents[bounds[i] : bounds[i + 1]]) for i in range(total)],
        dtype=object,
    )


def _make(rng: np.random.Generator, conv_lens: np.ndarray, start_us_lo: int,
          start_us_hi: int) -> pd.DataFrame:
    vocab = _vocab(rng)
    total = int(conv_lens.sum())
    n_convs = len(conv_lens)
    conv_names = np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object)
    conv_id = np.repeat(conv_names, conv_lens)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in conv_lens])

    role = rng.choice(ROLES, size=total, p=ROLE_P)
    first_turn = turn_idx == 0
    role[first_turn] = np.where(rng.random(first_turn.sum()) < 0.5, "system", "user")

    # tool names: zipf-ish weights s=1.5 over 12 tools
    w = 1.0 / np.arange(1, 13) ** 1.5
    w /= w.sum()
    tool = np.where(
        role == "tool", rng.choice(TOOLS, size=total, p=w), ""
    ).astype(object)

    # text: templated conversational sentences; tool turns JSON-ish
    text = _gen_text(rng, total, vocab)
    is_tool = role == "tool"
    tool_vals = rng.integers(0, 10_000, total)
    statuses = np.array(["ok", "error", "timeout", "partial"], dtype=object)
    tool_status = rng.choice(statuses, size=total, p=[0.85, 0.05, 0.05, 0.05])
    text[is_tool] = np.array(
        ['{"status": "%s", "value": %d}' % (s, v)
         for s, v in zip(tool_status[is_tool], tool_vals[is_tool])],
        dtype=object,
    )
    snip = rng.random(total) < 0.02
    text[snip] = text[snip] + " " + UTF8_SNIPPET

    # ts: conversation start uniform in window; per-turn gap 500ms + exp(20s)
    starts = rng.integers(start_us_lo, start_us_hi, n_convs)
    gaps = (500_000 + rng.exponential(20_000_000, total)).astype(np.int64)
    gaps[np.concatenate(([0], np.cumsum(conv_lens)[:-1]))] = 0
    conv_of_row = np.repeat(np.arange(n_convs), conv_lens)
    seg_base = np.repeat(
        np.concatenate(([0], np.cumsum(conv_lens)[:-1])), conv_lens
    )
    cum = np.cumsum(gaps)
    within = cum - cum[seg_base]
    ts_us = starts[conv_of_row] + within

    df = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role.astype(object),
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts_us, unit="us"),
        }
    )
    # shuffled on disk: engine must establish (conv_id, turn_idx) order itself
    perm = rng.permutation(total)
    return df.iloc[perm].reset_index(drop=True)


_START_LO = int(pd.Timestamp("2026-01-01").value // 1000)
_START_HI = int(pd.Timestamp("2026-06-30").value // 1000)


def transcripts_small(n_convs: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.geometric(0.08, n_convs), 2, 200)
    return _make(rng, lens, _START_LO, _START_HI)


def transcripts_tiny(seed: int = 42) -> pd.DataFrame:
    base = pd.Timestamp("2026-03-01").value // 1000
    return pd.DataFrame(
        {
            "conv_id": ["conv-a", "conv-a", "conv-b", "conv-b"],
            "turn_idx": np.array([0, 1, 0, 1], dtype=np.int32),
            "role": ["user", "assistant", "system", "tool"],
            "text": ["hi", "", "start", '{"status": "ok", "value": 1}'],
            "tool": ["", "", "", "search"],
            # two equal ts values -> zero delta path
            "ts": pd.to_datetime(
                [base, base + 1_000_000, base + 5, base + 5], unit="us"
            ),
        }
    )


def transcripts_extended(n_convs: int = 600, seed: int = 42) -> pd.DataFrame:
    """transcripts_small plus typed extra columns (reference M1 analogue:
    arbitrary INFO columns beyond the reserved set, schema.go:17-107):
    a double score, a boolean flag, a low-cardinality string, an int64
    counter, and an int array (serialized to string at normalize, P6)."""
    df = transcripts_small(n_convs=n_convs, seed=seed)
    rng = np.random.default_rng(seed + 1)
    n = len(df)
    df["score"] = np.round(rng.random(n) * 5, 2)          # float64
    df["flagged"] = rng.random(n) < 0.1                   # bool
    df["model"] = rng.choice(
        np.array(["m-small", "m-large", "m-turbo"], dtype=object), n
    )
    df["tokens_out"] = rng.integers(0, 4096, n)           # int64
    df["tags"] = [list(map(int, rng.integers(0, 9, rng.integers(0, 4))))
                  for _ in range(n)]                      # array<int>
    return df


def transcripts_skew(n_convs: int = 2240, mega_len: int = 12000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.geometric(0.08, n_convs), 2, 200)
    lens[0] = mega_len  # one conversation holds ~30% of all turns
    return _make(rng, lens, _START_LO, _START_HI)


def write_parquet(df: pd.DataFrame, path: str, compression: str = "zstd",
                  row_group_size: int = 65536) -> int:
    """Write with the baseline codec; returns file size in bytes.

    Small row groups keep the scan splittable — a single file with 1M-row
    groups caps the Spark map stage at a handful of tasks regardless of
    cluster size (the single-threaded-gzip problem the reference has,
    convert.go:42, transplanted to parquet).
    """
    import os

    import pyarrow.parquet as pq

    extras = [c for c in df.columns if c not in set(ARROW_SCHEMA.names)]
    if extras:  # dynamic schema: core fields typed, extras inferred
        inferred = pa.Schema.from_pandas(df, preserve_index=False)
        schema = pa.schema(
            list(ARROW_SCHEMA) + [inferred.field(c) for c in extras]
        )
    else:
        schema = ARROW_SCHEMA
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path, compression=compression,
                   row_group_size=row_group_size)
    return os.path.getsize(path)
