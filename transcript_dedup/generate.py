"""Deterministic synthetic transcript corpus with planted duplicate families.

Implements FIXTURES.md section 1: one row per turn with schema
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus an out-of-band ground-truth sidecar
``(conv_id, truth_cluster_id, family)``.

Seeded (default 42) and wall-clock-free: timestamps are derived
arithmetically from the seed epoch, so two runs are byte-identical.

Planted families (FIXTURES.md table):
  exact        copy of all turns under a fresh conv_id (ts perturbed only)
  near         token-level edits at 1-10% rate, occasional tail-turn drop
  substring    a short conversation's turns embedded contiguously in a longer one
  chain        A ~ B ~ C with A,C only transitively linked
  boilerplate  distinct convs sharing heavy template text (LSH skew stressor,
               must NOT merge)
  singleton    unique conversations
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

ROLES = ["user", "assistant"]
TOOLS = ["search", "bash", "editor", "browser", ""]

_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)

# boilerplate phrases: heavy templated text shared across many conversations
_BOILER = [
    "Hello! How can I help you today?",
    "Sure, let me look into that for you right away.",
    "Is there anything else I can help you with?",
    "I understand your concern, let me check the documentation first.",
    "Thanks for reaching out; could you share a bit more detail please?",
]


def _vocab(rng: np.random.Generator, size: int = 2000) -> np.ndarray:
    base = np.array([f"tok{i:04d}" for i in range(size)])
    # mix in punctuation / casing variants so the normalizer is exercised
    deco = rng.integers(0, 8, size=size)
    out = base.copy()
    out[deco == 1] = np.char.add(base[deco == 1], ",")
    out[deco == 2] = np.char.add(base[deco == 2], ".")
    out[deco == 3] = np.char.capitalize(base[deco == 3])
    out[deco == 4] = np.char.add(np.char.upper(base[deco == 4]), "!")
    return out


def _turn_text(rng: np.random.Generator, vocab: np.ndarray, n_tokens: int) -> str:
    return " ".join(vocab[rng.integers(0, len(vocab), size=n_tokens)])


def _edit_tokens(rng: np.random.Generator, vocab: np.ndarray, text: str, rate: float) -> str:
    toks = text.split(" ")
    out: list[str] = []
    for t in toks:
        r = rng.random()
        if r < rate / 3:
            continue  # delete
        if r < 2 * rate / 3:
            out.append(str(vocab[rng.integers(0, len(vocab))]))  # substitute
        else:
            out.append(t)
        if rng.random() < rate / 3:
            out.append(str(vocab[rng.integers(0, len(vocab))]))  # insert
    return " ".join(out) if out else text


class _Conv:
    __slots__ = ("conv_id", "turns", "truth", "family")

    def __init__(self, conv_id: str, turns: list[tuple[str, str, str]], truth: str, family: str):
        self.conv_id = conv_id
        self.turns = turns  # list of (role, text, tool)
        self.truth = truth
        self.family = family


def _base_conv(rng, vocab, conv_id, truth, family, n_turns=None, boiler_frac=0.15):
    n_turns = n_turns or int(min(64, 1 + rng.geometric(0.25)))
    turns = []
    for i in range(n_turns):
        role = ROLES[i % 2]
        tool = ""
        if role == "assistant" and rng.random() < 0.15:
            role, tool = "tool", TOOLS[rng.integers(0, 4)]
        # turn 0 is always unique content (>= 8 tokens) so no two base
        # conversations are accidentally identical all-boilerplate texts —
        # keeps the planted ground truth exact.
        if i > 0 and rng.random() < boiler_frac:
            text = _BOILER[rng.integers(0, len(_BOILER))]
        else:
            n_tok = int(np.clip(np.exp(rng.normal(3.0, 0.8)), 8 if i == 0 else 5, 400))
            text = _turn_text(rng, vocab, n_tok)
        turns.append((role, text, tool))
    return _Conv(conv_id, turns, truth, family)


def generate_corpus(
    n_conversations: int = 200, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (turns_df, truth_df).

    turns_df: conv_id, turn_idx, role, text, tool, ts
    truth_df: conv_id, truth_cluster_id, family
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    convs: list[_Conv] = []
    n = n_conversations

    # allocation: 40% singles, 15% exact-dup pairs, 20% near-dup pairs,
    # 10% substring pairs, 10% chains (triples), 5% boilerplate negatives
    n_exact = max(1, int(0.15 * n) // 2)
    n_near = max(1, int(0.20 * n) // 2)
    n_sub = max(1, int(0.10 * n) // 2)
    n_chain = max(1, int(0.10 * n) // 3)
    n_boiler = max(2, int(0.05 * n))
    i = 0

    def cid() -> str:
        nonlocal i
        i += 1
        return f"c{i:08d}"

    for _ in range(n_exact):
        base = _base_conv(rng, vocab, cid(), "", "exact")
        base.truth = base.conv_id
        dup = _Conv(cid(), list(base.turns), base.conv_id, "exact")
        convs += [base, dup]

    for _ in range(n_near):
        base = _base_conv(rng, vocab, cid(), "", "near")
        base.truth = base.conv_id
        rate = rng.uniform(0.01, 0.10)
        turns = [(r, _edit_tokens(rng, vocab, t, rate), tl) for r, t, tl in base.turns]
        if len(turns) > 3 and rng.random() < 0.3:
            turns = turns[:-1]  # tail-turn drop (duration-tolerance analogue)
        convs += [base, _Conv(cid(), turns, base.conv_id, "near")]

    for _ in range(n_sub):
        inner = _base_conv(rng, vocab, cid(), "", "substring", n_turns=int(2 + rng.integers(0, 3)))
        inner.truth = inner.conv_id
        pad_pre = _base_conv(rng, vocab, "pad", "", "pad", n_turns=int(2 + rng.integers(0, 4)))
        pad_post = _base_conv(rng, vocab, "pad", "", "pad", n_turns=int(2 + rng.integers(0, 4)))
        outer_turns = pad_pre.turns + list(inner.turns) + pad_post.turns
        convs += [inner, _Conv(cid(), outer_turns, inner.conv_id, "substring")]

    for _ in range(n_chain):
        a = _base_conv(rng, vocab, cid(), "", "chain", n_turns=int(6 + rng.integers(0, 8)))
        a.truth = a.conv_id
        b_turns = [(r, _edit_tokens(rng, vocab, t, 0.05), tl) for r, t, tl in a.turns]
        b = _Conv(cid(), b_turns, a.conv_id, "chain")
        c_turns = [(r, _edit_tokens(rng, vocab, t, 0.05), tl) for r, t, tl in b_turns]
        c = _Conv(cid(), c_turns, a.conv_id, "chain")
        convs += [a, b, c]

    for _ in range(n_boiler):
        # heavy shared template, distinct content -> must not merge
        c = _base_conv(rng, vocab, cid(), "", "boilerplate", boiler_frac=0.5)
        c.truth = c.conv_id
        convs.append(c)

    while len(convs) < n:
        c = _base_conv(rng, vocab, cid(), "", "singleton")
        c.truth = c.conv_id
        convs.append(c)

    rng.shuffle(convs)  # deterministic permutation

    rows = []
    truth_rows = []
    for ci, conv in enumerate(convs):
        truth_rows.append((conv.conv_id, conv.truth, conv.family))
        for ti, (role, text, tool) in enumerate(conv.turns):
            ts = _EPOCH + dt.timedelta(seconds=ci * 3600 + ti * 30)
            rows.append((conv.conv_id, ti, role, text, tool, ts))

    turns_df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32"})
    truth_df = pd.DataFrame(truth_rows, columns=["conv_id", "truth_cluster_id", "family"])
    return turns_df, truth_df


def corpus_to_spark(spark, turns_df: pd.DataFrame):
    """Upload the pandas corpus as a Spark DataFrame with the exact
    input_hint schema (conv_id string, turn_idx int, role/text/tool string,
    ts timestamp)."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    return spark.createDataFrame(turns_df, schema=schema)
