"""Text-analysis stages over the documents table — the training-data-pipeline
operators (language stats, token counting, quality scoring, fingerprinting,
exact dedup). All per-batch vectorized or hash-bound; aggregation is
pre-combined per batch before the one groupby shuffle.

Token definition shared with the SQL oracles: tokens = maximal runs of
non-whitespace (``\\S+``); empty/whitespace-only text has 0 tokens.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WS = re.compile(r"\S+")
_UPPER = re.compile(r"[A-Z]")
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")


def _md5s(texts) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


class _Fingerprint:
    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {"doc_id": t["doc_id"], "fp": pa.array(_md5s(texts), pa.string())}
        )


def doc_fingerprint(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, fp): md5 content fingerprint per document."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Fingerprint(), batch_format="pyarrow"
    )


class _DedupPartial:
    """Per-batch combiner: (hash → min doc_id, count). The 128-bit md5 is
    carried as TWO int64 columns (big-endian halves), not the hex string:
    Ray's sort-based aggregate partitions string keys ~100× slower than
    int64 keys (measured 1.75 s per 1.5k-row block at 200k docs), and the
    int pair also halves the shuffle payload."""

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        buf = b"".join(
            hashlib.md5(x.encode("utf-8")).digest() for x in texts
        )
        h = np.frombuffer(buf, dtype=">i8").astype(np.int64).reshape(-1, 2)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size == 0:
            return pa.table(
                {
                    "h1": pa.array([], pa.int64()),
                    "h2": pa.array([], pa.int64()),
                    "keeper": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ids, h[:, 1], h[:, 0]))
        h1, h2, sid = h[order, 0], h[order, 1], ids[order]
        new = np.empty(h1.size, dtype=bool)
        new[0] = True
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, h1.size))
        return pa.table(
            {
                "h1": pa.array(h1[starts]),
                "h2": pa.array(h2[starts]),
                "keeper": pa.array(sid[starts]),  # min doc_id: ids sorted
                "n": pa.array(counts.astype(np.int64)),
            }
        )


class _DedupHex:
    """Reassemble the md5 hex string from the int64 halves (output side
    only — the shuffle never carries the string)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        h = np.empty((t.num_rows, 2), dtype=">i8")
        h[:, 0] = t["h1"].to_numpy(zero_copy_only=False)
        h[:, 1] = t["h2"].to_numpy(zero_copy_only=False)
        buf = h.tobytes().hex()
        return pa.table(
            {
                "h": pa.array(
                    [buf[i * 32 : (i + 1) * 32] for i in range(t.num_rows)],
                    pa.string(),
                ),
                "keeper": t["keeper"],
                "n": t["n"],
            }
        )


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(h, keeper, n): content-hash groups, min-doc_id keeper, dup count.
    Hash-partition + per-group first — exact dedup at any scale."""
    partial = docs.select_columns(["doc_id", "text"]).map_batches(
        _DedupPartial(), batch_format="pyarrow"
    )
    agg = partial.groupby(["h1", "h2"]).aggregate(
        ray.data.aggregate.Min("keeper", alias_name="keeper"),
        ray.data.aggregate.Sum("n", alias_name="n"),
    )
    return agg.map_batches(_DedupHex(), batch_format="pyarrow")


def dedup_keep_first(docs: ray.data.Dataset) -> ray.data.Dataset:
    """The actual dedup: keep exactly one row (min doc_id) per distinct text.

    Bucketed SEMI-JOIN of the docs against the keeper-id table
    (stages.hashjoin.lookup_join with drop_missing): both sides stay
    distributed — at 1e12 docs the keeper set is ~all unique docs and can
    never be collected to the driver."""
    from ..stages.hashjoin import lookup_join

    keepers = exact_dedup(docs).map_batches(
        lambda t: pa.table(
            {
                "keeper": t["keeper"],
                "__one": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = lookup_join(
        docs, "doc_id", keepers, "keeper", "__one", "__m", drop_missing=True
    )
    return joined.map_batches(
        lambda t: t.drop_columns(["__m"]), batch_format="pyarrow"
    )


class _TokenStats:
    """Per-batch token statistics, fully Arrow-vectorized (this kernel
    backs token_stats, quality_score AND the curate gate — the hot loop of
    every 100-TB curation pass; the r3 version ran a Python findall per
    document).

    Token definition unchanged: maximal \\S+ runs. utf8_split_whitespace
    splits on the same Unicode whitespace set as Python's re \\s; empty
    slots from leading/trailing/repeated whitespace are masked out."""

    def __init__(self):
        self.stop = pa.array(STOPWORDS, pa.string())

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = t["text"].combine_chunks()
        toks = pc.utf8_split_whitespace(txt)
        flat = toks.flatten()  # window-adjusted even for sliced arrays
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        n = lens.size
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        stop_mask = pc.is_in(flat, value_set=self.stop).to_numpy(
            zero_copy_only=False
        )
        # per-row sums via reduceat over the list offsets (no 10M-element
        # np.repeat row-index array). reduceat segments run between the
        # starts of NONZERO-length rows — zero-length rows in between
        # contribute no elements, so each segment is exactly one row.
        n_tok = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)
        nz = lens > 0
        if flat.offset == 0 and len(flat) and nz.any():
            starts = np.zeros(n, np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            starts = starts[nz]
            n_tok[nz] = np.add.reduceat(nonempty.astype(np.int64), starts)
            n_stop[nz] = np.add.reduceat(stop_mask.astype(np.int64), starts)
        elif nz.any():  # sliced array fallback: row-index bincount
            rows = np.repeat(np.arange(n), lens)
            n_tok = np.bincount(rows[nonempty], minlength=n)
            n_stop = np.bincount(rows[stop_mask], minlength=n)
        n_up = pc.count_substring_regex(txt, "[A-Z]").to_numpy(
            zero_copy_only=False
        )
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok.astype(np.int64)),
                "n_stopwords": pa.array(n_stop.astype(np.int64)),
                "n_upper": pa.array(n_up.astype(np.int64)),
                "n_chars_py": pa.array(n_chars.astype(np.int64)),
            }
        )


def token_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_stopwords, n_upper, n_chars_py)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _TokenStats, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096
    )


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, chars_per_token, stopword_ratio, upper_ratio) —
    deterministic heuristic quality features. Ratios are single IEEE
    divisions of exact integers, so they hash bit-identical to the SQL
    oracle WITHOUT rounding (rounding would introduce half-even vs
    half-away mismatches at decimal midpoints)."""
    stats = token_stats(docs)

    def _score(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        ns = t["n_stopwords"].to_numpy(zero_copy_only=False).astype(np.float64)
        nu = t["n_upper"].to_numpy(zero_copy_only=False).astype(np.float64)
        nc = t["n_chars_py"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            cpt = np.where(nt > 0, nc / nt, 0.0)
            sr = np.where(nt > 0, ns / nt, 0.0)
            ur = np.where(nc > 0, nu / nc, 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "chars_per_token": pa.array(cpt),
                "stopword_ratio": pa.array(sr),
                "upper_ratio": pa.array(ur),
            }
        )

    return stats.map_batches(_score, batch_format="pyarrow")


def lang_distribution(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, n): per-batch pre-count then tiny groupby combine."""

    def _partial(t: pa.Table) -> pa.Table:
        langs, counts = np.unique(
            np.asarray(t["lang"].to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "lang": pa.array(list(langs), pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        docs.select_columns(["lang"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )


# -- language-ID heuristic (n-gram based, engine-native extra) --------------

_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is "),
    "de": (" der ", " und ", " die ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
}


class _LangId:
    """Vectorized marker-count language guess: one pc.count_substring pass
    per (language, marker) over the whole batch — no Python loop over
    documents (the marker table is the per-actor 'model' loaded once)."""

    def __init__(self):
        self.markers = {k: tuple(v) for k, v in _LANG_MARKERS.items()}
        self.langs = list(self.markers)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        padded = pc.binary_join_element_wise(
            pa.array([" "] * t.num_rows),
            pc.utf8_lower(t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]),
            pa.array([" "] * t.num_rows),
            "",
        )
        counts = np.zeros((len(self.langs), t.num_rows), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            for m in self.markers[lang]:
                counts[li] += pc.count_substring(padded, m).to_numpy(
                    zero_copy_only=False
                )
        best = np.argmax(counts, axis=0)
        bestc = counts[best, np.arange(t.num_rows)]
        langs_arr = np.array(self.langs, dtype=object)
        out = np.where(bestc > 0, langs_arr[best], "unk")
        return pa.table(
            {"doc_id": t["doc_id"], "lang_pred": pa.array(out.tolist(), pa.string())}
        )


def language_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, lang_pred): marker-n-gram language guess (stub-grade model,
    real engine would load fastText-style weights once per actor)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _LangId, batch_format="pyarrow", concurrency=(1, 8)
    )


class _WordCountPartial:
    """Per-batch combiner: (word -> count) via Arrow regex split + C++
    value_counts — output is vocab-sized, not token-sized."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.list_flatten(pc.split_pattern_regex(col, r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table({"word": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())})


class _VocabBucketTopK:
    """One call per coarse bucket (terms co-located by _CoarseKey, so
    per-bucket grouping is EXACT — the bucket only routes, the string
    itself is still the group key inside): Arrow group_by sum over the
    term strings, then the bucket's local top-k by (n desc, term asc),
    all in C++ kernels (sort_indices + take — no Python-object
    materialization of the vocab). The global top-k is a subset of the
    union of bucket top-ks, so the final tiny sort is exact."""

    def __init__(self, col: str, k: int):
        self.col, self.k = col, k

    def __call__(self, g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        agg = (
            g.select([self.col, "n"])
            .group_by(self.col)
            .aggregate([("n", "sum")])
        )
        order = pc.sort_indices(
            agg,
            sort_keys=[("n_sum", "descending"), (self.col, "ascending")],
        )
        top = agg.take(order.slice(0, self.k))
        return pa.table(
            {
                self.col: top[self.col],
                "n": pc.cast(top["n_sum"], pa.int64()),
            }
        )


def _vocab_topk(
    partial: ray.data.Dataset, col: str, k: int, buckets: int = 1024
) -> ray.data.Dataset:
    """Heavy-hitter finalize shared by word_topk/bigram_topk: the shuffle
    key is a small int bucket (NOT the term string — Ray's sort-based
    aggregate partitions string keys ~10-50x slower than ints, measured
    27 s over 7M bigram rows), each bucket resolves its terms exactly and
    pre-prunes to its local top-k, and the global sort touches only
    buckets * k rows. Routing reuses dedup._CoarseKey (one home for the
    content-hash bucketing policy and its same-version-across-workers
    contract)."""
    from .._util import named
    from .dedup import _CoarseKey

    tagged = partial.map_batches(
        _CoarseKey([col], nb=buckets), batch_format="pyarrow"
    )
    cand = tagged.groupby("__g").map_groups(
        named(_VocabBucketTopK(col, k)), batch_format="pyarrow"
    )
    return cand.sort(["n", col], descending=[True, False]).limit(k)


def word_topk(docs: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """(word, n): the k most frequent tokens corpus-wide (vocab heavy
    hitters — the first step of tokenizer/vocab building).

    Scale shape: each batch collapses to its own vocab before the one
    groupby shuffle, so shuffle volume is O(batches * vocab), never
    O(tokens); the shuffle is keyed by an int hash bucket and each bucket
    pre-prunes to its local top-k, so neither the aggregate nor the final
    sort ever orders the global vocab by string.
    Ties break by word ascending (deterministic vs the SQL oracle)."""
    partial = docs.select_columns(["text"]).map_batches(
        _WordCountPartial(), batch_format="pyarrow"
    )
    return _vocab_topk(partial, "word", k)


class _TopDocsPartial:
    """Per-batch combiner: keep only the per-lang top-k candidates."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        # Arrow-native top-k-per-group: one lexsort, then a vectorized
        # per-run rank < k mask (no pandas hop; cost O(batch log batch))
        lang = t["lang"].to_numpy(zero_copy_only=False)
        doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
        n_chars = t["n_chars"].to_numpy(zero_copy_only=False)
        if lang.size == 0:
            return t.select(["lang", "doc_id", "n_chars"])
        order = np.lexsort((doc_id, -n_chars, lang))
        ls = lang[order]
        new_run = np.empty(ls.size, dtype=bool)
        new_run[0] = True
        new_run[1:] = ls[1:] != ls[:-1]
        run_starts = np.nonzero(new_run)[0]
        rank = np.arange(ls.size) - np.repeat(run_starts, np.diff(
            np.append(run_starts, ls.size)
        ))
        keep = order[rank < self.k]
        return pa.table(
            {
                "lang": pa.array(lang[keep]),
                "doc_id": pa.array(doc_id[keep]),
                "n_chars": pa.array(n_chars[keep]),
            }
        )


def top_docs_per_lang(docs: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """(lang, doc_id, n_chars): the k longest documents per language,
    ties broken by doc_id ascending.

    Top-k-per-group without a global sort: each batch pre-prunes to its
    own per-lang top-k (shuffle volume O(batches * langs * k)), then one
    small per-lang group finalizes."""
    from .._util import named

    partial = docs.select_columns(["lang", "doc_id", "n_chars"]).map_batches(
        _TopDocsPartial(k), batch_format="pyarrow"
    )
    return partial.groupby("lang").map_groups(
        named(_TopDocsPartial(k)), batch_format="pyarrow"
    )


class _LenHistPartial:
    """Per-batch combiner: (lang, n_chars) -> count histogram rows."""

    def __call__(self, t: pa.Table) -> pa.Table:
        # Arrow-native (lang, n_chars) histogram — no pandas hop
        return (
            t.select(["lang", "n_chars"])
            .group_by(["lang", "n_chars"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "n_chars", "n"])
        )


class _HistMedian:
    """Exact median from a (value, count) histogram — DuckDB median
    semantics (mean of the two middle values for even totals)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = t["n_chars"].to_numpy(zero_copy_only=False)
        cnts = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        total = int(cum[-1])
        lo_i = int(np.searchsorted(cum, (total - 1) // 2, side="right"))
        hi_i = int(np.searchsorted(cum, total // 2, side="right"))
        med = (float(vals[lo_i]) + float(vals[hi_i])) / 2.0
        lang = t["lang"][0].as_py()
        return pa.table(
            {
                "lang": pa.array([lang], pa.string()),
                "median_chars": pa.array([med], pa.float64()),
            }
        )


def median_chars_by_lang(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(lang, median_chars): exact per-language median document length.

    Exact quantile at scale without sorting the corpus: lengths collapse
    to a (lang, value) -> count histogram (bounded by the value domain,
    not the row count); the median is read off the tiny histogram."""
    from .._util import named

    partial = docs.select_columns(["lang", "n_chars"]).map_batches(
        _LenHistPartial(), batch_format="pyarrow"
    )
    hist = partial.groupby(["lang", "n_chars"]).sum("n", ignore_nulls=True)
    hist = hist.map_batches(
        lambda t: pa.table(
            {"lang": t["lang"], "n_chars": t["n_chars"], "n": t["sum(n)"]}
        ),
        batch_format="pyarrow",
    )
    return hist.groupby("lang").map_groups(
        named(_HistMedian()), batch_format="pyarrow"
    )


class _DocTermCounts:
    """Per-batch (doc_id, word, tf) — documents are whole within a batch,
    so per-batch counts ARE the final per-doc term frequencies."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, r"\s+")
        toks = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False), lens
        )
        # Arrow-native (doc, word) count — object-dtype numpy / pandas
        # hashing here would be Python-speed per token
        flat = pa.table({"doc_id": pa.array(doc_ids), "word": toks}).filter(
            pc.not_equal(toks, "")
        )
        g = flat.group_by(["doc_id", "word"]).aggregate([("word", "count")])
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "word": g["word"],
                "tf": pc.cast(g["word_count"], pa.int64()),
            }
        )


class _GroupedTfidfTopK:
    """Coarse group (~thousands of COMPLETE doc_id groups per call, via
    `_CoarseKey`) → per-doc top-k terms by (tfidf desc, word asc), one
    lexsort + segment-rank per call instead of one Python call per
    document (the r3 scale-killer: 1e9 docs = 1e9 interpreter
    round-trips)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, g: pa.Table) -> pa.Table:
        cols = ["doc_id", "word", "tf", "tfidf"]
        if g.num_rows == 0:
            return g.select(cols) if set(cols) <= set(g.column_names) else g
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tfidf = g["tfidf"].to_numpy(zero_copy_only=False)
        # fixed-width unicode: C-speed lexsort (object dtype is Python-speed)
        word = g["word"].to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((word, -tfidf, doc))
        d = doc[order]
        newdoc = np.ones(d.size, dtype=bool)
        newdoc[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(newdoc)
        counts = np.diff(np.append(starts, d.size))
        rank = np.arange(d.size) - np.repeat(starts, counts)
        keep = order[rank < self.k]
        return g.take(pa.array(keep)).select(cols)


def tfidf_topk(docs: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """(doc_id, word, tf, tfidf): each document's k most characteristic
    terms, tfidf = tf * ln(N/df) rounded to 6 dp, ties by word ascending.

    Scale shape: term frequencies finalize per batch (documents never
    span batches); document frequencies pre-combine per batch before one
    vocab-sized groupby; the df table joins back in via the bucketed
    lookup_join (both sides distributed — no driver vocab dict); top-k
    finalizes over ~256 coarse hash groups of complete doc_id groups
    (one vectorized lexsort-segment call per coarse group, never one
    Python call per document)."""
    import pyarrow.compute as pc

    from .._util import named
    from ..stages.hashjoin import lookup_join

    n_docs = docs.count()
    tf = docs.select_columns(["doc_id", "text"]).map_batches(
        _DocTermCounts(), batch_format="pyarrow"
    ).materialize()  # consumed by the df aggregate AND the join

    def _df_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        vc = _pc.value_counts(t["word"])
        return pa.table(
            {
                "word": vc.field("values"),
                "df": _pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    df_table = (
        tf.map_batches(_df_partial, batch_format="pyarrow")
        .groupby("word")
        .sum("df", ignore_nulls=True)
        .map_batches(
            lambda t: pa.table({"word": t["word"], "df": t["sum(df)"]}),
            batch_format="pyarrow",
        )
    )
    joined = lookup_join(tf, "word", df_table, "word", "df", "df")

    def _score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = np.round(tfv * np.log(float(n_docs) / dfv), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "word": t["word"],
                "tf": t["tf"],
                "tfidf": pa.array(tfidf),
            }
        )

    scored = joined.map_batches(_score, batch_format="pyarrow")
    from .dedup import _CoarseKey

    return (
        scored.map_batches(_CoarseKey(["doc_id"]), batch_format="pyarrow")
        .groupby("__g")
        .map_groups(named(_GroupedTfidfTopK(k)), batch_format="pyarrow")
    )


class _BigramCountPartial:
    """Per-batch (bigram, n) combiner: consecutive non-empty token pairs
    within each document, zipped and counted entirely in Arrow/numpy."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")  # null text = no tokens, like word_topk
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(lists)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        docidx = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(mask))
        docidx = docidx[mask]
        if len(flat) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        same = pa.array(docidx[1:] == docidx[:-1])
        w1 = flat.slice(0, len(flat) - 1).filter(same)
        w2 = flat.slice(1).filter(same)
        bigrams = pc.binary_join_element_wise(w1, w2, " ")
        vc = pc.value_counts(bigrams)
        return pa.table(
            {
                "bigram": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )


def bigram_topk(docs: ray.data.Dataset, k: int = 20) -> ray.data.Dataset:
    """(bigram, n): the k most frequent consecutive token pairs corpus-wide
    (phrase mining / BPE-merge candidates). Same combiner shape as
    ``word_topk``: per-batch value_counts partial, then the int-bucketed
    exact heavy-hitter finalize (_vocab_topk) — 30.3 s → a few seconds at
    200k docs / 7M partial rows."""
    partial = docs.select_columns(["text"]).map_batches(
        _BigramCountPartial(), batch_format="pyarrow"
    )
    return _vocab_topk(partial, "bigram", k)


def curate(
    docs: ray.data.Dataset,
    min_tokens: int = 20,
    max_stopword_ratio: float = 0.3,
    langs: tuple = ("en", "de", "fr"),
) -> ray.data.Dataset:
    """(doc_id, lang, n_tokens): the composed curation pipeline — exact
    dedup keep-first, then token/stopword quality gates, then a language
    allowlist. One dedup semi-join plus one streaming stats pass; the
    whole chain stays a lazy Dataset (filterable, writable, joinable)."""
    kept = dedup_keep_first(docs)
    lang_ok = set(langs)

    def _gate(t: pa.Table) -> pa.Table:
        # reuse the canonical token/stopword counters (single source of
        # the \S+ token definition shared with the SQL oracles)
        stats = _TokenStats()(t.select(["doc_id", "text"]))
        n_tok = stats["n_tokens"].to_numpy(zero_copy_only=False)
        n_stop = stats["n_stopwords"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        langs_np = np.asarray(t["lang"].to_pylist(), dtype=object)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_tok > 0, n_stop / n_tok, 0.0)
        keep = (
            (n_tok >= min_tokens)
            & (ratio <= max_stopword_ratio)
            & np.isin(langs_np, list(lang_ok))
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "lang": t["lang"].filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep]),
            }
        )

    return kept.map_batches(_gate, batch_format="pyarrow")


class _HistQuantiles:
    """Exact interpolated quantiles from a (value, count) histogram —
    quantile_cont semantics: h = (n-1)q, x = v[⌊h⌋] + (h-⌊h⌋)(v[⌈h⌉]-v[⌊h⌋])."""

    def __init__(self, qs: tuple):
        self.qs = qs

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnts = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        out = {"lang": pa.array([t["lang"][0].as_py()], pa.string())}
        for q in self.qs:
            h = (n - 1) * q
            lo_i = int(np.searchsorted(cum, np.floor(h), side="right"))
            hi_i = int(np.searchsorted(cum, np.ceil(h), side="right"))
            frac = h - np.floor(h)
            x = vals[lo_i] + frac * (vals[hi_i] - vals[lo_i])
            out[f"p{int(q * 100)}"] = pa.array([round(float(x), 6)], pa.float64())
        return pa.table(out)


def length_quantiles_by_lang(
    docs: ray.data.Dataset, qs: tuple = (0.25, 0.5, 0.75)
) -> ray.data.Dataset:
    """(lang, p25, p50, p75): exact interpolated document-length quantiles
    per language — same value-domain-bounded histogram as the median, one
    readout per requested quantile."""
    from .._util import named

    partial = docs.select_columns(["lang", "n_chars"]).map_batches(
        _LenHistPartial(), batch_format="pyarrow"
    )
    hist = partial.groupby(["lang", "n_chars"]).sum("n", ignore_nulls=True)
    hist = hist.map_batches(
        lambda t: pa.table(
            {"lang": t["lang"], "n_chars": t["n_chars"], "n": t["sum(n)"]}
        ),
        batch_format="pyarrow",
    )
    return hist.groupby("lang").map_groups(
        named(_HistQuantiles(qs)), batch_format="pyarrow"
    )


def assign_splits(
    docs: ray.data.Dataset,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> ray.data.Dataset:
    """(doc_id, split): deterministic train/val/test assignment by a
    Knuth multiplicative hash of the id — reproducible across runs,
    machines and partitionings (never sample by row position: block
    boundaries are not stable). Stateless per batch; no shuffle at all."""
    val_cut = np.uint64(int(val_frac * (1 << 32)))
    test_cut = np.uint64(int((val_frac + test_frac) * (1 << 32)))

    def _assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = _knuth32(ids)
        out = np.where(
            h < val_cut, "val", np.where(h < test_cut, "test", "train")
        )
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(out.tolist(), pa.string())}
        )

    return docs.select_columns(["doc_id"]).map_batches(
        _assign, batch_format="pyarrow"
    )


def _knuth32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash mod 2^32 of int ids (uint64 wraparound) —
    the ONE spec constant shared by assign_splits, stratified_sample and
    their HUGEINT SQL oracles."""
    return (ids.astype(np.uint64) * np.uint64(2654435761)) % (
        np.uint64(1) << np.uint64(32)
    )


class _StratSamplePartial:
    """Per-batch combiner for stratified_sample: keep only each group's n
    smallest (hash, doc_id) rows; the final per-group stage recomputes the
    hash (stateless) and emits ranks. Both the empty and nonempty paths
    emit identical schemas (group column keeps its input Arrow type,
    doc_id is normalized to int64) so blocks unify under the groupby."""

    def __init__(self, n: int, group_col: str, emit_rank: bool = False):
        self.n, self.group_col, self.emit_rank = n, group_col, emit_rank

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if ids.size == 0 or self.n <= 0:
            sel = np.zeros(0, dtype=bool)
            keep = np.zeros(0, dtype=np.int64)
            rank = np.zeros(0, dtype=np.int64)
        else:
            group = t[self.group_col].to_numpy(zero_copy_only=False)
            h = _knuth32(ids)
            order = np.lexsort((ids, h, group))
            gs = group[order]
            new_run = np.empty(gs.size, dtype=bool)
            new_run[0] = True
            new_run[1:] = gs[1:] != gs[:-1]
            run_starts = np.nonzero(new_run)[0]
            rank = np.arange(gs.size) - np.repeat(
                run_starts, np.diff(np.append(run_starts, gs.size))
            )
            sel = rank < self.n
            keep = order[sel]
        out = {
            self.group_col: t[self.group_col].take(pa.array(keep)),
            "doc_id": pa.array(ids[keep].astype(np.int64)),
        }
        if self.emit_rank:
            out["sample_rank"] = pa.array((rank[sel] + 1).astype(np.int64))
        return pa.table(out)


def stratified_sample(
    docs: ray.data.Dataset, n: int = 20, group_col: str = "lang"
) -> ray.data.Dataset:
    """(group, doc_id, sample_rank): a deterministic n-per-group sample —
    each group's n smallest documents by (Knuth multiplicative hash of
    doc_id, doc_id). Hash order is a uniform pseudo-random permutation
    that is reproducible across runs, machines and partitionings (never
    sample by row position: block boundaries are not stable), so the same
    corpus always yields the same sample and a re-run can extend n
    monotonically (rank <= old n rows are unchanged).

    Scale shape: the same pre-prune + tiny-shuffle pattern as
    top_docs_per_lang — each batch collapses to its own per-group top-n
    first, so shuffle volume is O(batches * groups * n), never O(rows)."""
    partial = docs.select_columns([group_col, "doc_id"]).map_batches(
        _StratSamplePartial(n, group_col), batch_format="pyarrow"
    )
    from .._util import named

    return partial.groupby(group_col).map_groups(
        named(_StratSamplePartial(n, group_col, emit_rank=True)),
        batch_format="pyarrow",
    )


def truncate_tokens(
    docs: ray.data.Dataset, max_tokens: int = 64
) -> ray.data.Dataset:
    """(doc_id, text, n_tokens): each document cut to its first
    ``max_tokens`` whitespace tokens (single-space re-joined) — the
    pre-tokenization budget cap of an LLM pipeline. Stateless Arrow
    kernels per batch (trim → regex split → list_slice → join), no
    shuffle; whitespace-edge semantics verified token-for-token against
    the DuckDB formulation (both are RE2 `\\s+` splits). The trim uses
    the exact RE2 \\s character set ([\\t\\n\\f\\r ]) — NOT Unicode
    whitespace — so non-ASCII spaces (NBSP, U+2028, …) stay inside
    tokens on both sides (review r5: utf8_trim_whitespace silently
    deleted them while the oracle kept them)."""
    import pyarrow.compute as pc

    def _cut(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim(t["text"], " \t\n\f\r")
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        joined = pc.binary_join(pc.list_slice(toks, 0, max_tokens), " ")
        nt = np.minimum(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            max_tokens,
        ).astype(np.int64)
        empty_arr = pc.equal(trimmed, "")
        out_text = pc.if_else(empty_arr, "", joined)
        empty = empty_arr.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": out_text,
                "n_tokens": pa.array(np.where(empty, 0, nt)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _cut, batch_format="pyarrow"
    )


def mix_sample(
    docs: ray.data.Dataset,
    weights: dict,
    frac: float = 0.5,
    *,
    group_col: str = "lang",
) -> ray.data.Dataset:
    """(doc_id, group): deterministic mixture resampling — the dataset-mix
    step of an LLM data pipeline. Target count per group g is
    ``frac * N * weights[g]``; each group keeps the docs whose Knuth hash
    falls below ``min(1, target/n_g)`` of the hash range (an unbiased,
    reproducible subsample; groups needing MORE than they have keep
    everything — no upsampling). Groups absent from ``weights`` drop.

    One tiny groupby for the per-group counts, then a stateless streaming
    filter — no shuffle of the data itself."""
    import ray

    counts = (
        docs.select_columns([group_col]).groupby(group_col).count().take_all()
    )
    total = float(sum(r["count()"] for r in counts))
    cuts = {}
    for r in counts:
        g = r[group_col]
        if g in weights:
            p = min(1.0, frac * total * float(weights[g]) / float(r["count()"]))
            cuts[g] = np.uint64(np.floor(4294967296.0 * p))
    cuts_ref = ray.put(cuts)

    class _Keep:
        def __init__(self):
            self._keys = None
            self._cuts = None

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if self._keys is None:
                c = ray.get(cuts_ref)
                ks = sorted(c)
                self._keys = pa.array(ks)
                self._cuts = np.array([c[k] for k in ks], dtype=np.uint64)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            h = _knuth32(ids)
            # vectorized group → cut lookup (review r5: no per-row Python)
            idx = (
                pc.index_in(t[group_col], value_set=self._keys)
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cut = np.where(idx >= 0, self._cuts[np.maximum(idx, 0)], np.uint64(0))
            return t.filter(pa.array(h < cut))

    return docs.select_columns(["doc_id", group_col]).map_batches(
        _Keep(), batch_format="pyarrow"
    )


class _PackBucketSum:
    """Per-batch partial: (bucket, size sum) where bucket = the hash's high
    bits — buckets are hash-ordered, so a driver-side exclusive scan over
    the <=2^bits bucket sums yields each bucket's global starting offset."""

    def __init__(self, size_col: str, bits: int):
        self.size_col, self.bits = size_col, bits

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = _knuth32(ids)
        bucket = (h >> np.uint64(32 - self.bits)).astype(np.int64)
        size = t[self.size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ub, inv = np.unique(bucket, return_inverse=True)
        sums = np.zeros(ub.size, dtype=np.int64)
        np.add.at(sums, inv, size)
        return pa.table({"bucket": pa.array(ub), "size": pa.array(sums)})


class _PackAssign:
    """Per-bucket finalize: sort by (hash, doc_id), exclusive cumsum + the
    bucket's broadcast global offset, shard = offset // budget."""

    def __init__(self, size_col: str, bits: int, budget: int, offsets_ref):
        self.size_col, self.bits = size_col, bits
        self.budget, self.offsets_ref = budget, offsets_ref
        self._off = None

    def __call__(self, g: pa.Table) -> pa.Table:
        if self._off is None:
            self._off = ray.get(self.offsets_ref)  # {bucket: start_offset}
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _knuth32(ids)
        size = g[self.size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        excl = np.zeros(ids.size, dtype=np.int64)
        np.cumsum(size[order][:-1], out=excl[1:])
        bucket = int(h[order[0]] >> np.uint64(32 - self.bits))
        shard = (self._off[bucket] + excl) // self.budget
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "shard": pa.array(shard),
            }
        )


def pack_shards(
    docs: ray.data.Dataset,
    budget: int,
    *,
    size_col: str = "n_chars",
    bucket_bits: int = 8,
) -> ray.data.Dataset:
    """(doc_id, shard): deterministic training-export packing — docs are
    laid out in Knuth-hash order (a reproducible pseudo-random permutation,
    so shards are unbiased samples) and cut into shards of ~``budget``
    size units each (a doc starting before a boundary may overhang it;
    no doc is split).

    Scale shape — a distributed EXCLUSIVE PREFIX SUM without a global
    sort: the hash's high ``bucket_bits`` define <=2^bits hash-ordered
    coarse buckets; one streaming pass emits per-batch per-bucket size
    sums (tiny), the driver exclusive-scans the bucket totals (<=256
    rows), and one groupby(bucket) pass sorts each bucket locally and
    adds its broadcast global offset. Integer arithmetic throughout, so
    the assignment is exactly reproducible under any partitioning and
    matches the SQL window-cumsum oracle bit for bit."""
    import ray

    bits = bucket_bits
    partial = docs.select_columns(["doc_id", size_col]).map_batches(
        _PackBucketSum(size_col, bits), batch_format="pyarrow"
    )
    totals = partial.groupby("bucket").sum("size", ignore_nulls=True).take_all()
    by_bucket = {int(r["bucket"]): int(r["sum(size)"]) for r in totals}
    offsets = {}
    run = 0
    for b in sorted(by_bucket):
        offsets[b] = run
        run += by_bucket[b]

    def _bucketize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bucket = (_knuth32(ids) >> np.uint64(32 - bits)).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket))

    offsets_ref = ray.put(offsets)
    from .._util import named

    return (
        docs.select_columns(["doc_id", size_col])
        .map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            named(_PackAssign(size_col, bits, budget, offsets_ref)),
            batch_format="pyarrow",
        )
    )


def normalize_urls(
    pages: ray.data.Dataset, url_col: str = "url", out_col: str = "url_norm"
) -> ray.data.Dataset:
    """Append a canonical form of the url column — the link-graph hygiene
    step before url-keyed dedup or vertex-dictionary build. Rules (kept
    deliberately SQL-expressible so the oracle replicates them exactly):
    drop the #fragment, lowercase the scheme://authority prefix (path and
    query keep their case — they are case-sensitive), strip one trailing
    '/' — but NOT when the url has a query string (a slash ending '?p=/'
    is query content, not path decoration; review r5). Stateless Arrow
    regex kernels per batch (RE2, shared with DuckDB), no shuffle."""
    import pyarrow.compute as pc

    _AUTH = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*"

    def _norm(t: pa.Table) -> pa.Table:
        u = pc.replace_substring_regex(t[url_col], r"#.*$", "")
        head = pc.struct_field(
            pc.extract_regex(u, f"(?P<h>{_AUTH})"), "h"
        )
        rest = pc.replace_substring_regex(u, _AUTH, "")
        has = pc.is_valid(head)
        lowered = pc.binary_join_element_wise(
            pc.utf8_lower(pc.fill_null(head, "")), rest, ""
        )
        n = pc.if_else(has, lowered, u)
        n = pc.if_else(
            pc.match_substring(n, "?"),
            n,
            pc.replace_substring_regex(n, r"/$", ""),
        )
        return t.append_column(out_col, n)

    return pages.map_batches(_norm, batch_format="pyarrow")


def host_stats(pages: ray.data.Dataset) -> ray.data.Dataset:
    """(host, n_docs, n_chars): per-domain aggregates over a web corpus —
    the signal behind C4/RefinedWeb-style domain filtering and mixing.
    Each batch collapses to its own per-host partial (one Arrow regex pass
    + one in-batch group_by), so the shuffle carries O(batches * hosts)
    rows, never O(docs)."""
    import pyarrow.compute as pc

    def _partial(t: pa.Table) -> pa.Table:
        host = pc.extract_regex(t["url"], r"^https?://(?P<host>[^/]+)")
        host = pc.struct_field(host, "host")
        n_chars = pc.utf8_length(t["text"])
        g = (
            pa.table({"host": host, "n_chars": n_chars})
            .group_by("host")
            .aggregate([("n_chars", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["host", "n_chars", "n_docs"])

    partial = pages.select_columns(["url", "text"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    totals = partial.groupby("host").sum(["n_chars", "n_docs"], ignore_nulls=True)
    return totals.map_batches(
        lambda t: pa.table(
            {
                "host": t["host"],
                "n_docs": t["sum(n_docs)"],
                "n_chars": t["sum(n_chars)"],
            }
        ),
        batch_format="pyarrow",
    )


_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens): GPT-2-style pre-tokenizer count — letter
    runs, digit runs and punctuation runs, each with an optional leading
    space (the lookahead-free RE2 form; Arrow, DuckDB and Python re all
    agree on it, verified in tests). The cheap budget signal an LLM data
    pipeline uses before real BPE: stateless, one Arrow regex pass per
    batch, no shuffle."""
    import pyarrow.compute as pc

    def _count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t["text"], _BPE_PATTERN)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(n, pa.int64()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        _count, batch_format="pyarrow"
    )


class _RepetitionStats:
    """Per-batch repetition/quality signals (Gopher-style filters, Rae et
    al. 2021 §A1.1 — occurrence-fraction variant): per doc,
    ``dup_token_frac`` = 1 - distinct/total tokens and
    ``top_bigram_frac`` = occurrences of the doc's most frequent word
    bigram / total bigram occurrences. One vectorized pass: tokenize →
    xxhash → per-(doc, hash) run-length counts off a single lexsort →
    per-doc reductions with np.*.reduceat. No shuffle; output is one row
    per input row."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from .._util import roll_grams as _roll_grams
        from .._util import token_hashes as _token_hashes

        t = t.combine_chunks()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nd = len(ids)
        out = {
            "doc_id": ids,
            "n_tokens": np.zeros(nd, dtype=np.int64),
            "dup_token_frac": np.zeros(nd, dtype=np.float64),
            "top_bigram_frac": np.zeros(nd, dtype=np.float64),
        }

        def _per_doc_counts(gh, gd):
            """(doc -> total grams, doc -> distinct grams, doc -> max
            count of one gram) from a (gram_hash, doc_index) stream."""
            total = np.bincount(gd, minlength=nd).astype(np.int64)
            if not gh.size:
                z = np.zeros(nd, dtype=np.int64)
                return total, z, z
            order = np.lexsort((gh, gd))
            gh, gd = gh[order], gd[order]
            new_run = np.r_[True, (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])]
            run_starts = np.nonzero(new_run)[0]
            run_lens = np.diff(np.r_[run_starts, gh.size])
            run_doc = gd[run_starts]
            distinct = np.bincount(run_doc, minlength=nd).astype(np.int64)
            doc_starts = np.nonzero(np.r_[True, run_doc[1:] != run_doc[:-1]])[0]
            top = np.zeros(nd, dtype=np.int64)
            top[run_doc[doc_starts]] = np.maximum.reduceat(run_lens, doc_starts)
            return total, distinct, top

        # ONE tokenize+hash pass feeds both the unigram and bigram stats
        th, L, starts = _token_hashes(t)
        tot1, dis1, _ = _per_doc_counts(*_roll_grams(th, L, starts, 1))
        out["n_tokens"][:] = tot1
        has = tot1 > 0
        out["dup_token_frac"][has] = 1.0 - dis1[has] / tot1[has]
        tot2, _, top2 = _per_doc_counts(*_roll_grams(th, L, starts, 2))
        has2 = tot2 > 0
        out["top_bigram_frac"][has2] = top2[has2] / tot2[has2]
        return pa.table(out)


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens, dup_token_frac, top_bigram_frac): Gopher-style
    repetition filters over the corpus — a single streaming map_batches
    pass (every signal is per-document, so there is no shuffle and the
    text column is read exactly once)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _RepetitionStats(), batch_format="pyarrow"
    )
