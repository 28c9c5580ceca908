"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting — training-data operators over the ``documents``
table, all vectorized ``map_batches`` stages.

The regex work uses compiled-once state in actor-pool classes (setup in
``__init__``, per the stateful-stage rule), and Arrow kernels
(``pc.count_substring_regex``, ``pc.extract_regex``) where one exists.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TOKEN_RE = r"\S+"

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "pt": ("o", "a", "de", "e", "que", "em", "um", "para"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "por"),
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens (``\\S+`` runs), n_chars, avg_token_len — pure Arrow."""
    text = batch[text_col]
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    n_spaces = pc.count_substring(text, " ")
    avg_len = pc.round(
        pc.divide(
            pc.cast(pc.subtract(n_chars, n_spaces), pa.float64()),
            pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64()),
        ),
        4,
        round_mode="half_towards_infinity",
    )
    return batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64())) \
        .append_column("n_chars", pc.cast(n_chars, pa.int64())) \
        .append_column("avg_token_len", avg_len)


class QualityScorer:
    """Actor-pool stage: stopword-ratio + length-based quality score.

    Regex/sets compiled once per actor in ``__init__`` (the reference has
    no model-style stage — SURVEY.md §2.3 — this is the shape large-scale
    text pipelines need)."""

    def __init__(self, stop_lang: str = "en"):
        self.stops = set(STOPWORDS[stop_lang])

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_tokens = pc.cast(
            pc.max_element_wise(pc.count_substring_regex(text, TOKEN_RE), 1),
            pa.float64(),
        )
        stop_hits = None
        for w in sorted(self.stops):
            c = pc.count_substring_regex(text, rf"\b{w}\b")
            stop_hits = c if stop_hits is None else pc.add(stop_hits, c)
        ratio = pc.round(
            pc.divide(pc.cast(stop_hits, pa.float64()), n_tokens),
            4,
            round_mode="half_towards_infinity",
        )
        return batch.append_column("stop_ratio", ratio)


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 content fingerprint + 64-bit rolling (polynomial) hash.

    md5 has no Arrow kernel; the per-doc hashlib call is C-speed and the
    loop is over documents, not tokens.
    """
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    roll = np.zeros(len(texts), dtype=np.uint64)
    base = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        h = np.uint64(14695981039346656037)
        for b in t.encode("utf-8")[:256]:  # bounded rolling window
            h = (h * base) ^ np.uint64(b)
        roll[i] = h
    return batch.append_column("md5", pa.array(md5s)).append_column(
        "rolling_hash", pa.array(roll.view(np.int64))
    )


class LangId:
    """n-gram/stopword-vote language ID heuristic (actor-pool stage)."""

    def __init__(self):
        self.sets = {lang: set(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = {}
        text = batch["text"]
        for lang, ws in self.sets.items():
            s = None
            for w in sorted(ws):
                c = pc.count_substring_regex(text, rf"\b{w}\b")
                s = c if s is None else pc.add(s, c)
            scores[lang] = s.to_numpy(zero_copy_only=False)
        langs = sorted(scores)
        mat = np.stack([scores[lg] for lg in langs])
        pred = np.array(langs)[mat.argmax(axis=0)]
        conf = mat.max(axis=0) / np.maximum(mat.sum(axis=0), 1)
        # half-AWAY rounding (SQL ROUND semantics), not numpy's half-even —
        # the confidence feeds a hash-compared oracle column
        conf4 = pc.round(
            pa.array(conf.astype(np.float64)), 4,
            round_mode="half_towards_infinity",
        )
        return batch.append_column("pred_lang", pa.array(pred)).append_column(
            "lang_conf", conf4
        )


def analyze_documents(docs: rd.Dataset) -> rd.Dataset:
    """Composed text-analysis pipeline over a documents Dataset."""
    return (
        docs.map_batches(token_stats, batch_format="pyarrow")
        .map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
        .map_batches(fingerprints, batch_format="pyarrow")
    )
