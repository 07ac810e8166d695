"""Deterministic synthetic transcript generator (BASELINE.json input_hint).

Schema (exact): conv_id:string, turn_idx:int32, role:string, text:string,
tool:string (nullable), ts:timestamp.

Generation is distributed: ``spark.range(n_convs)`` fans conversation
indices across executors; an Arrow-batched ``mapInPandas`` kernel expands
each index into its turns with numpy — no per-row Python in the hot path,
and every draw is keyed by ``hash(seed, conv, turn)`` (FIXTURES.md §1) so
the output is a pure function of the conv index, independent of
partitioning. The pandas oracle runs the SAME kernel single-process; the
pytest invariant is that distributed execution reproduces it exactly under
stable (conv_id, turn_idx) ordering.

Zipf(s=1.2) tool popularity creates hub tool nodes — the skew the engine's
salting paths exist for (reference analog: the arc-balanced work split of
HyperBall.java:864-871 answers exactly this skew).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .rng import key_hash, randint, uniform, zipf_cdf, zipf_draw

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_WORDS = np.array(
    (
        "the graph node edge rank walk merge scan sort join tool call user "
        "agent turn reply plan code test data spark block gap delta pack "
        "link crawl host page index batch shuffle skew salt hub frontier"
    ).split()
)

_BASE_TS = np.datetime64("2025-01-01T00:00:00")
_MAX_TEXT_WORDS = 16


@dataclass(frozen=True)
class TranscriptSpec:
    """Generator parameters (FIXTURES.md §1 defaults)."""

    seed: int = 42
    min_turns: int = 2
    max_turns: int = 12
    n_tools: int = 8
    zipf_s: float = 1.2
    tool_call_prob: float = 0.4


def _expand_convs(convs: np.ndarray, spec: TranscriptSpec) -> pd.DataFrame:
    """Vectorized kernel: conversation indices -> transcript rows."""
    seed = spec.seed
    cdf = zipf_cdf(spec.n_tools, spec.zipf_s)
    tool_names = np.array([f"tool_{i:04d}" for i in range(spec.n_tools)])

    n_turns = randint(seed, spec.min_turns, spec.max_turns + 1, convs, 1)
    conv_rep = np.repeat(convs, n_turns)
    total = int(n_turns.sum())
    starts = np.concatenate(([0], np.cumsum(n_turns)[:-1]))
    turn = np.arange(total, dtype=np.int64) - np.repeat(starts, n_turns)

    # roles: even turns user, odd assistant; the turn after a tool call
    # becomes the tool-result turn (role="tool", same tool).
    role = np.where(turn % 2 == 0, "user", "assistant").astype(object)
    is_assistant = turn % 2 == 1
    calls_tool = is_assistant & (uniform(seed, conv_rep, turn, 2) < spec.tool_call_prob)
    tool_rank = zipf_draw(seed, cdf, conv_rep, turn, 3)
    tool = np.where(calls_tool, tool_names[tool_rank], None)
    prev_called = np.zeros(total, dtype=bool)
    prev_called[1:] = calls_tool[:-1] & (conv_rep[1:] == conv_rep[:-1])
    role[prev_called] = "tool"
    prev_tool = np.empty(total, dtype=object)
    prev_tool[1:] = tool[:-1]
    tool = np.where(prev_called, prev_tool, tool)

    # text: 4..15 words from the word list (fixed-width word-id matrix +
    # masked vectorized string concat — no per-row Python)
    n_words = 4 + (key_hash(seed, conv_rep, turn, 4) % np.uint64(12)).astype(np.int64)
    wid = np.empty((total, _MAX_TEXT_WORDS), dtype=np.int64)
    for k in range(_MAX_TEXT_WORDS):
        wid[:, k] = randint(seed, 0, len(_WORDS), conv_rep, turn, 100 + k)
    words = _WORDS[wid]
    words[np.arange(_MAX_TEXT_WORDS)[None, :] >= n_words[:, None]] = ""
    text = pd.Series(words[:, 0])
    for k in range(1, _MAX_TEXT_WORDS):
        text = text + np.where(words[:, k] == "", "", " ") + words[:, k]

    ts = _BASE_TS + (conv_rep * 3600 + turn * 30).astype("timedelta64[s]")
    conv_str = np.char.add("conv_", np.char.zfill(conv_rep.astype("U8"), 8))
    return pd.DataFrame(
        {
            "conv_id": conv_str,
            "turn_idx": turn.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 50,
    spec: TranscriptSpec = TranscriptSpec(),
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts DataFrame."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    num_partitions = max(1, min(num_partitions, n_convs))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            convs = pdf["id"].to_numpy(dtype=np.int64)
            if len(convs):
                yield _expand_convs(convs, spec)

    return spark.range(0, n_convs, 1, num_partitions).mapInPandas(
        gen, schema=TRANSCRIPT_SCHEMA
    )


def transcripts_pandas_oracle(
    n_convs: int = 50, spec: TranscriptSpec = TranscriptSpec()
) -> pd.DataFrame:
    """Single-process oracle: the same kernel, one batch, no Spark."""
    return _expand_convs(np.arange(n_convs, dtype=np.int64), spec)
