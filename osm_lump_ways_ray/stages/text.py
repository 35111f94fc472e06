"""Text-analysis stages for training-data pipelines (graft extension surface):
language-ID heuristic, quality scoring, token counting, document fingerprinting.

All are vectorized ``map_batches`` bodies over the ``documents``/pages text
column; tokenization is a plain single-space split so the DuckDB oracle
(``string_split(text, ' ')``) reproduces counts exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_hex

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that")

# marker-word language guesser — deliberately simple & SQL-expressible
LANG_MARKERS = (("en", " the "), ("de", " der "), ("fr", " le "), ("es", " el "))

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-row token counts: whitespace tokens + a BPE-ish regex token count."""
    texts = batch["text"].to_pylist()
    ws = np.fromiter((len(t.split(" ")) for t in texts), dtype=np.int64, count=len(texts))
    bpe = np.fromiter((len(_BPE_ISH.findall(t)) for t in texts), dtype=np.int64,
                      count=len(texts))
    return batch.append_column("ws_tokens", pa.array(ws, pa.int64())) \
                .append_column("bpe_tokens", pa.array(bpe, pa.int64()))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, stopword count, stopword ratio (×1e6 int so
    the oracle compare is exact integer arithmetic, no float hashing)."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    nchars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    ntok = np.empty(n, dtype=np.int64)
    nstop = np.empty(n, dtype=np.int64)
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        ntok[i] = len(toks)
        nstop[i] = sum(1 for w in toks if w in stop)
    ratio_ppm = nstop * 1_000_000 // ntok
    return batch.append_column("n_chars_txt", pa.array(nchars, pa.int64())) \
                .append_column("n_tokens", pa.array(ntok, pa.int64())) \
                .append_column("n_stopwords", pa.array(nstop, pa.int64())) \
                .append_column("stop_ppm", pa.array(ratio_ppm, pa.int64()))


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language guess (first match wins, 'other' fallback)."""
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        padded = " " + t + " "
        for lang, marker in LANG_MARKERS:
            if marker in padded:
                out.append(lang)
                break
        else:
            out.append("other")
    return batch.append_column("detected_lang", pa.array(out, pa.string()))


def fingerprint_batch(batch: pa.Table, prefix_len: int = 64) -> pa.Table:
    """Document fingerprint: md5 of the first ``prefix_len`` chars (rolling-hash
    analog with exact SQL parity via ``md5(substr(text, 1, 64))``)."""
    texts = batch["text"].to_pylist()
    fp = [md5_hex(t[:prefix_len]) for t in texts]
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))
