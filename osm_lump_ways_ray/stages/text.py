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
    """Per-row token counts: whitespace tokens + a BPE-ish regex token count.
    Both are Arrow C kernels (r4): list_value_length over a split, and
    count_substring_regex (RE2 — same alternation semantics as re.findall
    for this disjoint-class pattern)."""
    import pyarrow.compute as pc

    ws = pc.list_value_length(pc.split_pattern(batch["text"], " ")) \
        .cast(pa.int64())
    bpe = pc.count_substring_regex(
        batch["text"], _BPE_ISH.pattern).cast(pa.int64())
    return batch.append_column("ws_tokens", ws) \
                .append_column("bpe_tokens", bpe)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, stopword count, stopword ratio (×1e6 int so
    the oracle compare is exact integer arithmetic, no float hashing).
    Vectorized (r4): one split + is_in kernel pass + segment sum — the same
    shape as ``oov_stats``; no per-row Python."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch["text"], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    nchars = pc.utf8_length(batch["text"]).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    ntok = pc.list_value_length(words).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(words)
    is_stop = pc.cast(pc.is_in(flat, value_set=pa.array(STOPWORDS)),
                      pa.int64()).to_numpy(zero_copy_only=False)
    ends = np.cumsum(ntok)
    csum = np.concatenate([[0], np.cumsum(is_stop)])
    nstop = csum[ends] - csum[ends - ntok]
    ratio_ppm = nstop * 1_000_000 // ntok
    return batch.append_column("n_chars_txt", pa.array(nchars, pa.int64())) \
                .append_column("n_tokens", pa.array(ntok, pa.int64())) \
                .append_column("n_stopwords", pa.array(nstop, pa.int64())) \
                .append_column("stop_ppm", pa.array(ratio_ppm, pa.int64()))


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language guess (first match wins, 'other' fallback).
    Vectorized (r4): one match_substring C-kernel pass per marker +
    np.select — no per-row Python."""
    import pyarrow.compute as pc

    padded = pa.table({"t": batch["text"]})  # keep chunk layout
    padded = pc.binary_join_element_wise(" ", padded["t"], " ", "")
    hits = [pc.match_substring(padded, marker)
            .to_numpy(zero_copy_only=False).astype(bool)
            for _, marker in LANG_MARKERS]
    out = np.select(hits, [lang for lang, _ in LANG_MARKERS],
                    default="other")
    return batch.append_column("detected_lang",
                               pa.array(out.astype("U"), pa.string()))


def fingerprint_batch(batch: pa.Table, prefix_len: int = 64) -> pa.Table:
    """Document fingerprint: md5 of the first ``prefix_len`` chars (rolling-hash
    analog with exact SQL parity via ``md5(substr(text, 1, 64))``). Vectorized
    (r4): Arrow substring slice + the two-block numpy md5 + nibble-lookup hex
    — no per-row Python."""
    import pyarrow.compute as pc

    from ..functions.hashing import md5_digests_ascii, md5_hex_of_digests

    prefix = pc.utf8_slice_codeunits(batch["text"], 0, prefix_len)
    fp = md5_hex_of_digests(md5_digests_ascii(prefix))
    return batch.append_column("fingerprint", pa.array(fp, pa.string()))


# ─────────────────────────────────────────────── corpus vocabulary (wordcount)

def vocab_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch PARTIAL token counts — the combiner half of the classic
    wordcount: split every text on single spaces (Arrow kernel, zero Python
    loop), flatten, and pre-aggregate within the batch so the global shuffle
    moves (token, partial_count) rows bounded by per-batch vocabulary size,
    never one row per token occurrence. At 100 TB this is the difference
    between shuffling ~10^13 token rows and ~10^8 vocab rows."""
    import pyarrow.compute as pc

    toks = pc.list_flatten(pc.split_pattern(batch["text"], " "))
    part = pa.table({"token": toks}).group_by("token").aggregate([
        ("token", "count")])
    return part.rename_columns(["token", "c"])


def vocab_topk(docs_ds, k: int = 50):
    """Corpus-level top-``k`` tokens by frequency (ties broken token-ascending):
    partial counts inside ``map_batches`` → small groupby SUM → sort+limit.
    Deterministic across runs and parallelism levels."""
    from ray.data.aggregate import Sum

    counts = docs_ds.map_batches(vocab_partial_batch, batch_format="pyarrow") \
                    .groupby("token").aggregate(Sum("c", alias_name="n"))
    top = counts.sort(["n", "token"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda b: pa.table({"token": b["token"], "n": b["n"].cast(pa.int64())}),
        batch_format="pyarrow")


# ───────────────────────────────────────────────── normalization fingerprints

def normalize_batch(batch: pa.Table) -> pa.Table:
    """Text normalization (lowercase + ASCII-space trim) with an md5
    fingerprint of the normalized form — the dedup-key prep step of a
    training-data pipeline. Arrow kernels end-to-end; exact DuckDB parity via
    ``md5(trim(lower(text)))`` (both sides RE2/utf8-lower semantics)."""
    import pyarrow.compute as pc

    norm = pc.utf8_trim(pc.utf8_lower(batch["text"]), " ")
    fp = [md5_hex(t) for t in norm.to_pylist()]
    return batch.append_column("norm_text", norm) \
                .append_column("norm_fp", pa.array(fp, pa.string()))


# ─────────────────────────────────────────────────────── PII pattern counting

# RE2 syntax on BOTH sides (pyarrow count_substring_regex and DuckDB regexp_*
# are RE2) — semantics match by construction
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_DIGITSEQ_RE = r"[0-9]{6,}"


def pii_counts_batch(batch: pa.Table) -> pa.Table:
    """Per-row counts of email-shaped and long-digit-sequence matches
    (phone/SSN analog) — the scrubbing pre-pass of a training-data pipeline.
    Vectorized RE2 over the whole column; no Python row loop."""
    import pyarrow.compute as pc

    emails = pc.count_substring_regex(batch["text"], PII_EMAIL_RE)
    digits = pc.count_substring_regex(batch["text"], PII_DIGITSEQ_RE)
    return batch.append_column("n_emails", emails.cast(pa.int64())) \
                .append_column("n_digitseq", digits.cast(pa.int64()))


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signal: distinct-token ratio per document in
    integer ppm (1e6 × distinct/total, floor). Entirely Arrow C kernels —
    explode to (row, token) and let ``group_by`` compute count_distinct; the
    stat is per-document, so it never leaves the batch (no shuffle)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch["text"], " ")
    total = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = len(batch)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), total)
    flat = pa.table({"row": pa.array(row_idx, pa.int64()),
                     "token": pc.list_flatten(toks)})
    dist = flat.group_by("row").aggregate([("token", "count_distinct")])
    distinct = np.zeros(n, dtype=np.int64)
    distinct[dist["row"].to_numpy(zero_copy_only=False)] = \
        dist["token_count_distinct"].to_numpy(zero_copy_only=False)
    ppm = distinct * 1_000_000 // total
    return batch.append_column("distinct_ppm", pa.array(ppm, pa.int64()))


def stratified_sample(docs_ds, rates: dict, *, group_col: str = "lang",
                      key_col: str = "doc_id", default=(1, 1)):
    """Deterministic stratified sampling: keep a row iff
    ``key % den < num`` for its group's ``(num, den)`` rate — a pure map-side
    filter (no shuffle, no RNG state), reproducible at any parallelism and
    resumable for free. ``rates``: {group_value: (num, den)};  groups not
    listed use ``default``."""

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        groups = batch[group_col].to_pylist()
        num = np.empty(len(keys), dtype=np.int64)
        den = np.empty(len(keys), dtype=np.int64)
        for i, g in enumerate(groups):
            num[i], den[i] = rates.get(g, default)
        return batch.filter(pa.array((keys % den) < num))

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def length_histogram(docs_ds, bucket_width: int = 100,
                     col: str = "n_chars"):
    """Document-length histogram: fixed-width buckets → per-bucket count.
    The bucket key is computed inside ``map_batches`` (no Python loop) so the
    groupby shuffles one small row per (block, bucket)."""
    from ray.data.aggregate import Count

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.floor(pc.divide(batch[col].cast(pa.float64()), bucket_width))
        return pa.table({"bucket": b.cast(pa.int64())})

    return docs_ds.map_batches(bucketize, batch_format="pyarrow") \
                  .groupby("bucket").aggregate(Count(alias_name="n"))


def tfidf_top_terms(docs_ds, k: int = 3, *, num_partitions: int = 16):
    """Per-document top-k TF-IDF terms with an INTEGER idf so the DuckDB
    oracle is value-exact: ``idf_milli = (n_docs * 1000) // df``,
    ``score = tf * idf_milli``; ties break on term ascending.

    Shape: per-batch (doc, term, tf) counting (each document lives in one row,
    so per-batch counting is exact) → document-frequency via the hash-bucket
    combiner → cogroup join back → per-doc-bucket vectorized head(k). The df
    table is one row per vocabulary term — the broadcast-join fast path picks
    it up when it fits, the partitioned path engages when it doesn't."""
    import pandas as pd

    from .relational import bucket_agg, cogroup_join

    n_docs = docs_ds.count()

    def term_counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = [t.split(" ") for t in texts]
        lens = np.fromiter((len(x) for x in toks), dtype=np.int64,
                           count=len(toks))
        flat = pd.DataFrame({
            "doc_id": np.repeat(ids, lens),
            "term": np.concatenate([np.asarray(x, dtype=object)
                                    for x in toks]) if len(toks) else
                    np.array([], dtype=object),
        })
        out = flat.groupby(["doc_id", "term"], as_index=False, sort=False) \
                  .size().rename(columns={"size": "tf"})
        return pa.Table.from_pandas(out, preserve_index=False)

    tf = docs_ds.map_batches(term_counts, batch_format="pyarrow")
    df_tbl = bucket_agg(tf, "term", {"df": (None, "count")},
                        num_partitions=num_partitions)
    joined = cogroup_join(tf, df_tbl, on="term",
                          num_partitions=num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = tfv * (n_docs * 1000 // dfv)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"], "term": batch["term"],
            "score": pa.array(s, pa.int64()),
            "_part": pa.array(d % num_partitions, pa.int64()),
        })

    scored = joined.map_batches(score, batch_format="pyarrow")

    def topk(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "term", "score"]).to_pandas()
        df = df.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="mergesort")
        head = df.groupby("doc_id", sort=False).head(k).copy()
        head["rank"] = head.groupby("doc_id", sort=False).cumcount() + 1
        return pa.Table.from_pandas(head, preserve_index=False)

    return scored.groupby("_part").map_groups(topk, batch_format="pyarrow")


def json_int_field(ds, col: str, key: str, out: str):
    """Vectorized JSON integer-field extraction via Arrow's C regex kernel
    (``pc.extract_regex``) — no per-row Python json.loads. Rows without the
    key get null (dropped by the cast-filter)."""
    import pyarrow.compute as pc

    pattern = f'"{key}"\\s*:\\s*(?P<v>-?\\d+)'

    def extract(batch: pa.Table) -> pa.Table:
        hit = pc.extract_regex(batch[col], pattern=pattern)
        vals = pc.struct_field(hit, "v").cast(pa.int64())
        return batch.append_column(out, vals)

    return ds.map_batches(extract, batch_format="pyarrow")


# ──────────────────────────────────────────── OOV rate vs corpus vocabulary

def oov_stats(docs_ds, *, vocab_k: int = 100, id_col: str = "doc_id",
              text_col: str = "text"):
    """Per-document out-of-vocabulary stats vs the corpus top-``vocab_k``
    vocabulary: (doc_id, n_tokens, n_oov) — the CCNet-style quality signal
    ("how much of this page is junk relative to the corpus' head vocab").

    Two passes over the corpus: (1) ``vocab_topk`` (map-side combined
    wordcount — the shuffle is bounded by per-block vocab, not token count);
    (2) the vocabulary — k rows, bounded by construction — is broadcast once
    via ``ray.put`` and each batch scores itself with one Arrow ``is_in``
    C-kernel pass + a segment sum. No per-row Python in either pass."""
    import pyarrow.compute as pc
    import ray

    top = vocab_topk(docs_ds, k=vocab_k)
    vocab = pa.array(sorted(r["token"] for r in top.take_all()), pa.string())
    vref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import cached_state

        vs = cached_state((vref.hex(), "oov_vocab"), lambda _k: ray.get(vref))
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(words)
        oov = pc.cast(pc.invert(pc.is_in(flat, value_set=vs)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ends = np.cumsum(counts)
        starts = ends - counts
        csum = np.concatenate([[0], np.cumsum(oov)])
        n_oov = csum[ends] - csum[starts]
        return pa.table({
            "doc_id": batch[id_col],
            "n_tokens": pa.array(counts, pa.int64()),
            "n_oov": pa.array(n_oov.astype(np.int64), pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow")


# ─────────────────────────────────────────────── bigram (co-occurrence) topk

def bigram_partial_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-batch PARTIAL bigram counts: consecutive-token pairs within each
    doc, built by one element-wise join of the flattened token array against
    its own 1-shift (a doc-boundary mask drops cross-doc pairs). Same
    combiner contract as ``vocab_partial_batch``."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch[text_col], " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    if n < 2:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "c": pa.array([], pa.int64())})
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    same_doc = doc_of[:-1] == doc_of[1:]
    big = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
    big = big.filter(pa.array(same_doc))
    part = pa.table({"bigram": big}).group_by("bigram").aggregate([
        ("bigram", "count")])
    return part.rename_columns(["bigram", "c"])


def bigram_topk(docs_ds, k: int = 25, *, text_col: str = "text"):
    """Corpus top-``k`` bigrams (ties bigram-ascending): partial counts per
    batch → small global SUM → sort+limit — the n-gram LM / phrase-mining
    counting kernel at wordcount cost."""
    from ray.data.aggregate import Sum

    counts = docs_ds.map_batches(
        lambda b: bigram_partial_batch(b, text_col=text_col),
        batch_format="pyarrow").groupby("bigram").aggregate(
            Sum("c", alias_name="n"))
    top = counts.sort(["n", "bigram"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda b: pa.table({"bigram": b["bigram"],
                            "n": b["n"].cast(pa.int64())}),
        batch_format="pyarrow")


def vocab_topk_by_group(docs_ds, k: int = 5, *, group_col: str = "lang",
                        text_col: str = "text", num_partitions: int = 8):
    """Per-group vocabulary top-``k`` (top domains/tokens per language — the
    grouped flavour of the wordcount kernel): per-batch (group, token)
    partials → combiner-backed bucketed SUM → per-group rank via the
    hash-partitioned group runner (one task per PARTITION, not per group).
    Ties break token-ascending. Emits (group, token, n, rank)."""
    import pandas as pd
    import pyarrow.compute as pc

    from .relational import bucket_agg, map_groups_partitioned

    def partials(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        grp = batch[group_col].take(pa.array(
            np.repeat(np.arange(len(counts), dtype=np.int64), counts)))
        part = pa.table({group_col: grp, "token": pc.list_flatten(words)}) \
            .group_by([group_col, "token"]).aggregate([("token", "count")])
        return part.rename_columns([group_col, "token", "c"])

    counts = bucket_agg(
        docs_ds.map_batches(partials, batch_format="pyarrow"),
        [group_col, "token"], {"n": ("c", "sum")},
        num_partitions=num_partitions, combine=True)

    def topk(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(k).copy()
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[[group_col, "token", "n", "rank"]]

    return map_groups_partitioned(counts, topk, group_col,
                                  num_partitions=num_partitions)


def bigram_lift(docs_ds, *, min_count: int = 20, min_lift_milli: int = 1200,
                text_col: str = "text", num_partitions: int = 8):
    """Association mining over consecutive-token pairs: integer LIFT
    ``(c_pair · N_tokens · 1000) // (c_w1 · c_w2)`` — the PMI-family collocation
    score in exact integer arithmetic (no transcendentals, so the oracle is
    value-exact). Emits (w1, w2, n_pair, lift_milli) for pairs at or above
    both thresholds.

    Shape: two combiner-backed wordcounts (unigram + bigram — shuffles
    bounded by vocab, not tokens), a scalar token total, and two joins of the
    bigram table against the unigram counts (broadcast fast path when the
    vocabulary fits; partitioned cogroup above)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .relational import bucket_agg, cogroup_join

    uni = bucket_agg(
        docs_ds.map_batches(vocab_partial_batch, batch_format="pyarrow"),
        ["token"], {"c": ("c", "sum")},
        num_partitions=num_partitions, combine=True)
    total = int(uni.sum("c") or 0)
    big = bucket_agg(
        docs_ds.map_batches(
            lambda b: bigram_partial_batch(b, text_col=text_col),
            batch_format="pyarrow"),
        ["bigram"], {"n_pair": ("c", "sum")},
        num_partitions=num_partitions, combine=True)
    def split_filter(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["n_pair"],
                                pa.scalar(min_count, pa.int64()))
        f = b.filter(keep)
        parts = pc.split_pattern(f["bigram"], " ")
        return pa.table({"w1": pc.list_element(parts, 0),
                         "w2": pc.list_element(parts, 1),
                         "n_pair": f["n_pair"].cast(pa.int64())})

    big = big.map_batches(split_filter, batch_format="pyarrow")
    j = cogroup_join(big, uni.rename_columns(["w1", "c1"]), ("w1",),
                     how="inner", num_partitions=num_partitions)
    j = cogroup_join(j, uni.rename_columns(["w2", "c2"]), ("w2",),
                     how="inner", num_partitions=num_partitions)

    def score(b: pa.Table) -> pa.Table:
        npair = b["n_pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift = npair * total * 1000 // (c1 * c2)
        keep = lift >= min_lift_milli
        idx = pa.array(np.flatnonzero(keep))
        return pa.table({"w1": b["w1"].take(idx), "w2": b["w2"].take(idx),
                         "n_pair": pa.array(npair[keep], pa.int64()),
                         "lift_milli": pa.array(lift[keep], pa.int64())})

    return j.map_batches(score, batch_format="pyarrow")


def search_topk(docs_ds, query_terms, k: int = 10, *,
                id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int = 16):
    """Inverted-index TERM RETRIEVAL: score every document against a fixed
    bag of query terms with the integer tf·idf used by ``tfidf_top_terms``
    (idf_milli = n_docs·1000 // df, df over matching docs) and return the
    global top-k (score DESC, doc_id ASC — a total order, so the cut is
    deterministic).

    Scale shape: the query bag is tiny and rides into every task as a
    closure constant (an Arrow value_set, not a shuffle side); the only
    per-corpus pass is one vectorized ``is_in`` over the flattened tokens —
    rows leaving it are bounded by matching (doc, term) pairs. df is |Q|
    rows, so the idf join always takes the broadcast fast path. The final
    top-k is per-block partials (≤ k rows each) merged once — never a
    global sort of the corpus."""
    import pandas as pd
    import pyarrow.compute as pc

    from .relational import bucket_agg, cogroup_join, snapshot

    qset = pa.array(sorted(set(query_terms)), pa.string())
    n_docs = docs_ds.count()

    def tf_rows(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(texts, " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(words)
        hit = pc.is_in(flat, value_set=qset).to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(ids, counts)[hit]
        terms = flat.filter(pa.array(hit)).to_numpy(zero_copy_only=False)
        out = pd.DataFrame({"doc_id": doc_of, "term": terms}) \
            .groupby(["doc_id", "term"], as_index=False, sort=False).size() \
            .rename(columns={"size": "tf"})
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    tf = snapshot(docs_ds.map_batches(tf_rows, batch_format="pyarrow"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    if tf.count() == 0:
        import ray.data

        return ray.data.from_arrow(empty)
    df_tbl = bucket_agg(tf, "term", {"df": (None, "count")},
                        num_partitions=num_partitions, combine=True)
    joined = cogroup_join(tf, df_tbl, on="term",
                          num_partitions=num_partitions)

    def score(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "part": pa.array(tfv * (n_docs * 1000 // dfv),
                                          pa.int64())})

    per_doc = bucket_agg(joined.map_batches(score, batch_format="pyarrow"),
                         "doc_id", {"score": ("part", "sum")},
                         num_partitions=num_partitions, combine=True)

    def blk_topk(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "score"]).to_pandas()
        df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    partials = per_doc.map_batches(blk_topk, batch_format="pyarrow")
    return partials.repartition(1).map_batches(blk_topk,
                                               batch_format="pyarrow")
