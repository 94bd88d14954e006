"""Text-analysis stages for large-scale training-data pipelines:
deterministic tokenization, token counting, language-ID, quality scoring,
document fingerprinting (rolling hash / SimHash).

No reference analog (the reference has no text corpus ops); these are the
first-class additions required for the 100 TB training-data use case. All
kernels are vectorized or dictionary-amortized; the tokenizer is deliberately
SQL-expressible (DuckDB oracle: list_transform over string_split) so the
driver can verify it end-to-end.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.functions.farmhash import farmhash64_bytes

_WORD_RE = re.compile(r"\S+")
# BPE-ish pre-tokenizer: words, numbers, punctuation runs (GPT-2-style split,
# public regex family)
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")


def simple_token_id(word: str, vocab_size: int = 50_000) -> int:
    """Deterministic, SQL-expressible token id:
    (len(w)*7919 + ord(first)*31 + ord(last)) % vocab_size.

    DuckDB twin:
    ``(length(w)*7919 + ord(substr(w,1,1))*31 + ord(substr(w,length(w),1)))
    % vocab_size``
    """
    return (len(word) * 7919 + ord(word[0]) * 31 + ord(word[-1])) % vocab_size


class TokenizeTransformer(Transformer):
    """Whitespace-split text -> array<int32> of deterministic token ids.

    Produces the F1 tokens-table shape from a documents table; paired with a
    DuckDB list_transform oracle in __ray_entry__.oracle_sql.
    """

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, vocab_size: int = 50_000, **kwargs):
        super().__init__(*args, **kwargs)
        self.vocab_size = int(vocab_size)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        split = pc.split_pattern_regex(pc.fill_null(flat, ""), pattern=r"\s+")
        wl, words = A.unwrap(split)
        V = self.vocab_size
        # hash each DISTINCT word once (dictionary encode), gather per occurrence
        d = words.dictionary_encode()
        dict_vals = d.dictionary.to_pylist()
        dv = np.fromiter(
            (
                (len(w) * 7919 + ord(w[0]) * 31 + ord(w[-1])) % V if w else -1
                for w in dict_vals
            ),
            dtype=np.int64,
            count=len(dict_vals),
        )
        idx = np.asarray(d.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        ids = dv[idx] if len(idx) else np.zeros(0, np.int64)
        keep = ids >= 0
        offsets = wl[0][0]
        # drop empty-string words (leading/trailing whitespace artifacts)
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        kept_per_row = csum[offsets[1:]] - csum[offsets[:-1]]
        new_offsets = np.zeros(len(offsets), dtype=np.int64)
        np.cumsum(kept_per_row, out=new_offsets[1:])
        out = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array(ids[keep].astype(np.int32), pa.int32()),
        )
        out = A.rewrap(levels, out)
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class TokenCountTransformer(Transformer):
    """Count tokens: ``mode='whitespace'`` counts \\S+ runs; ``mode='bpe'``
    counts GPT-2-style word/number/punct pre-tokens."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, mode: str = "whitespace", **kwargs):
        super().__init__(*args, **kwargs)
        if mode not in ("whitespace", "bpe"):
            raise ValueError("mode must be whitespace|bpe")
        self.mode = mode

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))

        def kernel(flat):
            pat = r"\S+" if self.mode == "whitespace" else _BPE_RE.pattern
            counts = pc.count_substring_regex(flat, pattern=pat)
            return pc.cast(counts, pa.int64())

        out = A.lift(kernel, arr)
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


# Character/stopword profiles for a lightweight n-gram language heuristic.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was", "with", "are", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf", "ein", "eine", "nicht"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "pour", "que", "dans", "du"},
    "es": {"el", "la", "los", "las", "de", "y", "es", "un", "una", "para", "que", "en", "del"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "non", "sono", "con", "del"},
}


class LanguageIdTransformer(Transformer):
    """Heuristic language ID: stopword-hit voting over the configured
    profiles; 'unknown' when no profile scores. Vectorized per distinct word
    via dictionary encoding."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, languages: list[str] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.languages = languages or list(_LANG_STOPWORDS)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        langs = self.languages
        tables = [_LANG_STOPWORDS[lg] for lg in langs]
        n_rows = len(flat)
        # explode to words, score each DISTINCT word once (dictionary encode),
        # then per-row segment-sum of votes — no per-row Python loop
        words_list = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(flat, "")), pattern=r"\s+"
        )
        wl, words = A.unwrap(words_list)
        offsets = wl[0][0]
        d = words.dictionary_encode()
        dict_vals = d.dictionary.to_pylist()
        score_matrix = np.zeros((max(len(dict_vals), 1), len(langs)), dtype=np.int64)
        for vi, w in enumerate(dict_vals):
            for li, tb in enumerate(tables):
                if w in tb:
                    score_matrix[vi, li] = 1
        idx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        per_word = score_matrix[idx] if len(words) else np.zeros((0, len(langs)), np.int64)
        lens = np.diff(offsets)
        row_scores = np.zeros((n_rows, len(langs)), dtype=np.int64)
        if len(words):
            nz = lens > 0
            starts = offsets[:-1].clip(max=len(words) - 1)
            red = np.add.reduceat(per_word, starts, axis=0)
            row_scores[nz] = red[nz]
        best = np.argmax(row_scores, axis=1)
        best_score = row_scores[np.arange(n_rows), best]
        lang_arr = np.array(langs + ["unknown"], dtype=object)
        choice = np.where(best_score > 0, best, len(langs))
        res = A.rewrap(levels, pa.array(lang_arr[choice], pa.string()))
        return _append_or_replace(batch, self.output_col, self._cast_out(res))


class QualityScoreTransformer(Transformer):
    """Heuristic document-quality features: emits four columns
    ``<out>_len``, ``<out>_punct_ratio``, ``<out>_stop_ratio``,
    ``<out>_score`` (composite in [0,1])."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, stopwords: set | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.stopwords = set(stopwords) if stopwords else set(_LANG_STOPWORDS["en"])

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        _, flat = A.unwrap(arr)
        n_chars = pc.utf8_length(pc.fill_null(flat, "")).to_numpy(zero_copy_only=False).astype(np.float64)
        n_punct = pc.count_substring_regex(pc.fill_null(flat, ""), pattern=r"[^\w\s]").to_numpy(zero_copy_only=False).astype(np.float64)
        n_words = pc.count_substring_regex(pc.fill_null(flat, ""), pattern=r"\S+").to_numpy(zero_copy_only=False).astype(np.float64)
        # stopword hits: explode -> score distinct words once -> segment-sum
        words_list = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(flat, "")), pattern=r"\s+"
        )
        wl, words = A.unwrap(words_list)
        offsets = wl[0][0]
        d = words.dictionary_encode()
        dict_vals = d.dictionary.to_pylist()
        is_stop = np.fromiter(
            ((w in self.stopwords) for w in dict_vals), dtype=np.int64, count=len(dict_vals)
        )
        idx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        per_word = is_stop[idx] if len(words) else np.zeros(0, np.int64)
        lens = np.diff(offsets)
        stop_hits = np.zeros(len(flat), dtype=np.float64)
        if len(words):
            starts = offsets[:-1].clip(max=len(words) - 1)
            red = np.add.reduceat(per_word, starts)
            stop_hits[lens > 0] = red[lens > 0]
        with np.errstate(invalid="ignore", divide="ignore"):
            punct_ratio = np.where(n_chars > 0, n_punct / np.where(n_chars == 0, 1, n_chars), 0.0)
            stop_ratio = np.where(n_words > 0, stop_hits / np.where(n_words == 0, 1, n_words), 0.0)
        length_score = np.clip(n_chars / 1000.0, 0, 1)
        score = 0.4 * length_score + 0.3 * np.clip(stop_ratio * 3, 0, 1) + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1))
        base = self.output_col
        batch = _append_or_replace(batch, f"{base}_len", pa.array(n_chars.astype(np.int64)))
        batch = _append_or_replace(batch, f"{base}_punct_ratio", pa.array(punct_ratio))
        batch = _append_or_replace(batch, f"{base}_stop_ratio", pa.array(stop_ratio))
        return _append_or_replace(batch, f"{base}_score", pa.array(score))

    @property
    def outputs(self):
        base = self.output_col
        return [f"{base}_len", f"{base}_punct_ratio", f"{base}_stop_ratio", f"{base}_score"]


class FingerprintTransformer(Transformer):
    """64-bit document fingerprints:
    - ``method='rolling'``: polynomial rolling hash over word farmhashes
      (content fingerprint — equal iff token streams equal);
    - ``method='simhash'``: 64-bit SimHash over word hashes (near-dup
      detection: similar docs -> small hamming distance)."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, method: str = "rolling", **kwargs):
        super().__init__(*args, **kwargs)
        if method not in ("rolling", "simhash"):
            raise ValueError("method must be rolling|simhash")
        self.method = method

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        n_rows = len(flat)
        M = (1 << 64) - 1
        # explode to words; hash each DISTINCT word once via dictionary encode
        words_list = pc.split_pattern_regex(pc.fill_null(flat, ""), pattern=r"\s+")
        wl, words = A.unwrap(words_list)
        offsets = wl[0][0]
        d = words.dictionary_encode()
        from kamae_ray.functions.farmhash import hash64_column

        wh, _ = hash64_column(d.dictionary)  # vectorized, per DISTINCT word
        nonempty = pc.not_equal(d.dictionary, "").to_numpy(zero_copy_only=False)
        dict_hashes = np.where(nonempty, wh, np.uint64(0))
        idx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        hv = dict_hashes[idx] if len(words) else np.zeros(0, np.uint64)
        # drop empty-string artifacts of the whitespace split
        keep = nonempty[idx] if len(words) else np.zeros(0, bool)
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        row_counts = csum[offsets[1:]] - csum[offsets[:-1]]
        hv = hv[keep]
        new_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(row_counts, out=new_offsets[1:])
        out = np.zeros(n_rows, dtype=np.uint64)
        if self.method == "rolling":
            # polynomial chain is inherently sequential per row; the word
            # hashes above are already batch-amortized
            P = 1099511628211
            for i in range(n_rows):
                acc = 1469598103934665603  # FNV offset basis as seed
                for h in hv[new_offsets[i] : new_offsets[i + 1]]:
                    acc = ((acc * P) ^ int(h)) & M
                out[i] = acc
        else:
            # vectorized SimHash: unpack all word-hash bits at once, then one
            # segmented sum per row — no 64-iteration Python loop per doc
            if len(hv):
                bits = np.unpackbits(
                    hv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.int64)  # (n_words, 64), column b = bit b
                starts = new_offsets[:-1].clip(max=len(hv) - 1)
                sums = np.add.reduceat(bits, starts, axis=0)  # (n_rows, 64)
                majority = (sums * 2 > row_counts[:, None]) & (row_counts[:, None] > 0)
                packed = np.packbits(
                    majority.astype(np.uint8), axis=1, bitorder="little"
                )  # (n_rows, 8)
                out = packed.view(np.uint64).reshape(-1)
        res = A.rewrap(levels, pa.array(out.view(np.int64), pa.int64()))
        return _append_or_replace(batch, self.output_col, self._cast_out(res))


class RepetitionSignalsTransformer(Transformer):
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1 —
    public heuristics for filtering repetitive web text), three per-doc
    fractions in [0, 1]:

    - ``{out}_dup_line_frac``: fraction of non-empty lines (split on
      newline) whose exact content occurs more than once in the document;
    - ``{out}_dup_line_char_frac``: same, weighted by line length in chars;
    - ``{out}_top_bigram_char_frac``: characters covered by the most
      frequent word bigram (count x (len(w1)+len(w2))) over total word
      chars. Ties on count resolve to the LONGEST bigram (deterministic and
      SQL-expressible: max by (count, charlen)).

    Fully vectorized: lines/words are flattened once per block, every
    DISTINCT line/word is dictionary-encoded once, per-(doc, value) counts
    come from one np.unique, per-doc reductions are bincount/reduceat — no
    per-row Python, no shuffle (each document is one row)."""

    compatible_dtypes = (pa.string(),)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        flat = pc.fill_null(A.as_array(self._cast_in(batch.column(self.input_col))), "")
        n = len(flat)
        dup_line_frac = np.zeros(n)
        dup_char_frac = np.zeros(n)
        bigram_frac = np.zeros(n)
        if n:
            # --- duplicate lines
            ll, lines = A.unwrap(pc.split_pattern(flat, "\n"))
            loff = ll[0][0]
            parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(loff))
            line_len = pc.utf8_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
            ne = line_len > 0
            parent_ne, llen = parent[ne], line_len[ne]
            if len(parent_ne):
                d = lines.filter(pa.array(ne)).dictionary_encode()
                codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                key = parent_ne * (codes.max() + 1) + codes
                _, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
                dup = cnt[inv] > 1
                tot_l = np.bincount(parent_ne, minlength=n)
                tot_c = np.bincount(parent_ne, weights=llen, minlength=n)
                dup_l = np.bincount(parent_ne[dup], minlength=n)
                dup_c = np.bincount(parent_ne[dup], weights=llen[dup], minlength=n)
                with np.errstate(invalid="ignore", divide="ignore"):
                    dup_line_frac = np.where(tot_l > 0, dup_l / np.where(tot_l == 0, 1, tot_l), 0.0)
                    dup_char_frac = np.where(tot_c > 0, dup_c / np.where(tot_c == 0, 1, tot_c), 0.0)
            # --- top word-bigram coverage
            wl, words = A.unwrap(pc.split_pattern_regex(flat, pattern=r"\s+"))
            woff = wl[0][0]
            wparent = np.repeat(np.arange(n, dtype=np.int64), np.diff(woff))
            wlen = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
            wkeep = wlen > 0
            wparent, wlen = wparent[wkeep], wlen[wkeep]
            wchars = np.bincount(wparent, weights=wlen, minlength=n)
            if len(wparent) > 1:
                wd = words.filter(pa.array(wkeep)).dictionary_encode()
                wcodes = wd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                adj = wparent[:-1] == wparent[1:]
                if adj.any():
                    bparent = wparent[:-1][adj]
                    bkey = wcodes[:-1][adj] * (wcodes.max() + 1) + wcodes[1:][adj]
                    blen = wlen[:-1][adj] + wlen[1:][adj]
                    mat = np.ascontiguousarray(np.stack([bparent, bkey], axis=1))
                    _, first, cnt = np.unique(
                        mat.view([("", mat.dtype)] * 2).reshape(-1),
                        return_index=True, return_counts=True,
                    )
                    up, uglen = bparent[first], blen[first]
                    # per-doc lexicographic max of (count, gram length)
                    order = np.lexsort((uglen, cnt, up))
                    up_s = up[order]
                    seg_last = np.concatenate([np.nonzero(up_s[1:] != up_s[:-1])[0], [len(up_s) - 1]])
                    best = order[seg_last]
                    num = cnt[best].astype(np.float64) * blen[first][best]
                    docs = up[best]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        bigram_frac[docs] = num / np.where(wchars[docs] == 0, 1, wchars[docs])
        base = self.output_col
        batch = _append_or_replace(batch, f"{base}_dup_line_frac", pa.array(dup_line_frac))
        batch = _append_or_replace(batch, f"{base}_dup_line_char_frac", pa.array(dup_char_frac))
        return _append_or_replace(batch, f"{base}_top_bigram_char_frac", pa.array(bigram_frac))

    @property
    def outputs(self):
        base = self.output_col
        return [
            f"{base}_dup_line_frac",
            f"{base}_dup_line_char_frac",
            f"{base}_top_bigram_char_frac",
        ]


class NGramTransformer(Transformer):
    """Word n-grams: whitespace-split ``input_col`` and emit the list of
    ``n``-word shingles joined by ``separator`` (list<string>, length
    ``max(0, n_words - n + 1)``). The text twin of the hashed shingles the
    dedup pipeline uses internally — here the grams themselves are the
    feature (count vectorizers, collocation stats).

    Vectorized: one whitespace split per block, gram strings built with a
    single ``binary_join_element_wise`` over ``n`` shifted takes of the
    flattened word array — no per-row Python."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, n: int = 2, separator: str = " ", **kwargs):
        super().__init__(*args, **kwargs)
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = int(n)
        self.separator = separator

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        n_rows = len(flat)
        split = pc.split_pattern_regex(pc.fill_null(flat, ""), pattern=r"\s+")
        wl, words = A.unwrap(split)
        offsets = wl[0][0]
        # drop empty-string artifacts of the whitespace split (leading /
        # trailing / all-whitespace docs)
        nonempty = pc.not_equal(words, "")
        keep = nonempty.to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        row_counts = csum[offsets[1:]] - csum[offsets[:-1]]
        words = words.filter(nonempty)
        starts = np.concatenate([[0], np.cumsum(row_counts)[:-1]])
        k = self.n
        gram_cnt = np.maximum(row_counts - k + 1, 0)
        total = int(gram_cnt.sum())
        gstart = np.repeat(starts, gram_cnt) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(gram_cnt)[:-1]]), gram_cnt)
        )
        if total:
            parts = [words.take(pa.array(gstart + j)) for j in range(k)]
            grams = parts[0] if k == 1 else pc.binary_join_element_wise(*parts, self.separator)
        else:
            grams = pa.array([], pa.string())
        goff = pa.array(np.concatenate([[0], np.cumsum(gram_cnt)]).astype(np.int32))
        lst = pa.ListArray.from_arrays(goff, grams)
        res = A.rewrap(levels, lst) if levels else lst
        return _append_or_replace(batch, self.output_col, res)


_PII_PATTERNS: dict[str, tuple[str, str]] = {
    # RE2 syntax on BOTH engines (pyarrow and DuckDB embed RE2), so the
    # redacted text is bit-identical to the regexp_replace(..., 'g') oracle.
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d(?:[ \-]?\d){6,}", "<PHONE>"),
}


class RedactPiiTransformer(Transformer):
    """PII scrubbing — the pre-training corpus-release step (C4 / CCNet
    lineage): replace email addresses, IPv4 addresses and phone-like digit
    runs with typed placeholder tokens, and count the matches per category.

    Emits ``<out>`` (the redacted text) plus ``<out>_n_<name>`` int64 match
    counts. Patterns apply IN ORDER; each category is counted on the text as
    it stands after the previous categories' replacements (an email's digits
    can never double-count as a phone). Fully vectorized — one
    ``count_substring_regex`` + one ``replace_substring_regex`` per category
    (compiled RE2, no per-row Python); stateless ``map_batches`` stage, no
    shuffle. Custom categories via ``patterns={name: (regex, replacement)}``.
    """

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, patterns: dict[str, tuple[str, str]] | None = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.patterns = dict(patterns) if patterns is not None else dict(_PII_PATTERNS)
        if not self.patterns:
            raise ValueError("patterns must be non-empty")

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        cur = flat
        counts = {}
        for name, (pat, rep) in self.patterns.items():
            counts[name] = pc.count_substring_regex(cur, pattern=pat)
            cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
        batch = _append_or_replace(batch, self.output_col, A.rewrap(levels, cur))
        for name, c in counts.items():
            batch = _append_or_replace(
                batch, f"{self.output_col}_n_{name}",
                A.rewrap(levels, pc.cast(c, pa.int64())),
            )
        return batch

    @property
    def outputs(self):
        return [self.output_col] + [f"{self.output_col}_n_{k}" for k in self.patterns]


def redact_oracle_exprs(text_expr: str, out_col: str,
                        patterns: dict[str, tuple[str, str]] | None = None) -> str:
    """SQL select-list computing the SAME redaction/counts (oracle
    generation): nested regexp_replace(…,'g') + len(regexp_extract_all) on
    the same intermediate text states."""
    patterns = patterns if patterns is not None else _PII_PATTERNS
    cur = text_expr
    exprs = []
    counts = []
    for name, (pat, rep) in patterns.items():
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{p}')) AS BIGINT) AS {out_col}_n_{name}"
        )
        cur = f"regexp_replace({cur}, '{p}', '{rep}', 'g')"
    exprs.append(f"{cur} AS {out_col}")
    return ", ".join(exprs + counts)


class LineFilterTransformer(Transformer):
    """C4-style line-level document cleaning (Raffel 2020 §2.2 lineage): split
    the document on ``separator``, keep only lines that (a) contain at least
    ``min_words`` words, (b) end in a terminal punctuation mark
    (``terminal_regex``), and (c) contain no blocklisted substring
    (case-insensitive); re-join the survivors. Emits ``<out>`` (the cleaned
    text; null in -> null out) plus ``<out>_n_lines`` / ``<out>_n_kept``.

    Fully vectorized: ONE ``split_pattern`` per batch, per-line rules as
    Arrow regex/substring kernels over the FLATTENED line array, per-doc
    kept counts via one ``add.reduceat``, and the cleaned text from a
    rebuilt ListArray + ``binary_join`` — no per-row Python, no shuffle.
    Exactly mirrored by the DuckDB list-lambda oracle
    (``line_filter_oracle_exprs``): both engines run the same RE2 patterns.
    """

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, separator: str = "\n", min_words: int = 3,
                 terminal_regex: str | None = r"[.!?]$",
                 blocklist: list[str] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.separator = separator
        self.min_words = int(min_words)
        self.terminal_regex = terminal_regex
        self.blocklist = [b.lower() for b in (blocklist or [])]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        flat = A.as_array(self._cast_in(batch.column(self.input_col)))
        valid_np = pc.is_valid(flat).to_numpy(zero_copy_only=False)
        lines_list = pc.split_pattern(pc.fill_null(flat, ""), pattern=self.separator)
        lines_list = A._normalize_list(lines_list)
        offsets = lines_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = lines_list.values
        keep = np.ones(len(values), dtype=bool)
        if self.min_words > 0:
            wc = pc.count_substring_regex(values, pattern=r"\S+")
            keep &= wc.to_numpy(zero_copy_only=False) >= self.min_words
        if self.terminal_regex:
            keep &= pc.match_substring_regex(
                values, pattern=self.terminal_regex
            ).to_numpy(zero_copy_only=False)
        if self.blocklist:
            low = pc.utf8_lower(values)
            for b in self.blocklist:
                keep &= ~pc.match_substring(low, pattern=b).to_numpy(zero_copy_only=False)
        n = len(flat)
        lens = np.diff(offsets)
        n_kept = np.zeros(n, dtype=np.int64)
        if len(values):
            starts = offsets[:-1].clip(max=len(values) - 1)
            red = np.add.reduceat(keep.astype(np.int64), starts)
            n_kept[lens > 0] = red[lens > 0]
        new_offsets = np.concatenate(([0], np.cumsum(n_kept)))
        kept_lines = values.filter(pa.array(keep))
        rebuilt = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_lines
        )
        joined = pc.binary_join(rebuilt, self.separator)
        # null when the input was null OR no line survived (SQL
        # array_to_string-of-empty-list semantics: a fully-filtered doc has
        # no text, not an empty string)
        nulls = pa.array(valid_np & (n_kept > 0))
        joined = pc.if_else(nulls, joined, pa.nulls(n, pa.string()))
        nulls = pa.array(valid_np)
        n_lines_arr = pc.if_else(nulls, pa.array(lens), pa.nulls(n, pa.int64()))
        n_kept_arr = pc.if_else(nulls, pa.array(n_kept), pa.nulls(n, pa.int64()))
        base = self.output_col
        batch = _append_or_replace(batch, base, joined)
        batch = _append_or_replace(batch, f"{base}_n_lines", n_lines_arr)
        return _append_or_replace(batch, f"{base}_n_kept", n_kept_arr)

    @property
    def outputs(self):
        return [self.output_col, f"{self.output_col}_n_lines", f"{self.output_col}_n_kept"]


def line_filter_oracle_exprs(text_expr: str, out_col: str,
                             separator_sql: str = "chr(10)", min_words: int = 3,
                             terminal_regex: str | None = r"[.!?]$",
                             blocklist: list[str] | None = None) -> str:
    """SQL select-list computing the SAME line filter (oracle generation):
    string_split + list_filter lambda + array_to_string."""
    conds = []
    if min_words > 0:
        conds.append(rf"len(regexp_extract_all(x, '\S+')) >= {min_words}")
    if terminal_regex:
        conds.append(f"regexp_matches(x, '{terminal_regex.replace(chr(39), chr(39)*2)}')")
    for b in blocklist or []:
        conds.append(f"NOT contains(lower(x), '{b.lower().replace(chr(39), chr(39)*2)}')")
    cond = " AND ".join(conds) if conds else "TRUE"
    split = f"string_split({text_expr}, {separator_sql})"
    filt = f"list_filter({split}, x -> {cond})"
    return (
        f"array_to_string({filt}, {separator_sql}) AS {out_col}, "
        f"CAST(len({split}) AS BIGINT) AS {out_col}_n_lines, "
        f"CAST(len({filt}) AS BIGINT) AS {out_col}_n_kept"
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


class GopherQualityTransformer(Transformer):
    """The full Gopher document-quality rule bundle (Rae et al. 2021, table
    A1 — the standard pre-training quality gate; QualityScoreTransformer is
    the soft-score sibling, this is the published hard filter):

    - word count within ``[min_words, max_words]``
    - mean word length within ``[min_word_len, max_word_len]``
    - symbol-to-word ratio ('#' or '...') at most ``symbol_ratio``
    - at least ``alpha_frac`` of words contain an alphabetic character
    - at least ``min_stopwords`` DISTINCT stopwords present

    Emits exact-integer evidence columns (``<out>_n_words``, ``_n_chars``
    = summed word lengths, ``_n_symbols``, ``_n_alpha_words``,
    ``_n_stopwords``), one boolean per rule (``_flag_*``) and the overall
    ``<out>_pass``. EVERY flag is an integer comparison (ratios as
    cross-multiplied rationals, lesson-24 family), so results are
    bit-identical to the SQL oracle (``gopher_oracle_exprs``) — no float
    boundary ULPs. One stateless vectorized map (a handful of RE2 scans per
    batch); no shuffle, no state. Line-level Gopher rules (bullet/ellipsis
    line ratios) are LineFilterTransformer's domain."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, min_words: int = 50, max_words: int = 100_000,
                 min_word_len: int = 3, max_word_len: int = 10,
                 symbol_ratio: tuple[int, int] = (1, 10),
                 alpha_frac: tuple[int, int] = (4, 5),
                 min_stopwords: int = 2,
                 stopwords: tuple[str, ...] = _GOPHER_STOPWORDS, **kwargs):
        super().__init__(*args, **kwargs)
        self.min_words, self.max_words = int(min_words), int(max_words)
        self.min_word_len, self.max_word_len = int(min_word_len), int(max_word_len)
        self.symbol_ratio = (int(symbol_ratio[0]), int(symbol_ratio[1]))
        self.alpha_frac = (int(alpha_frac[0]), int(alpha_frac[1]))
        self.min_stopwords = int(min_stopwords)
        self.stopwords = tuple(stopwords)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        flat = A.as_array(self._cast_in(batch.column(self.input_col)))
        valid = pc.is_valid(flat)
        f = pc.fill_null(flat, "")

        def cnt(pattern):
            return pc.count_substring_regex(f, pattern=pattern).to_numpy(
                zero_copy_only=False).astype(np.int64)

        n_words = cnt(r"\S+")
        n_ws = cnt(r"\s")
        n_chars = pc.utf8_length(f).to_numpy(zero_copy_only=False).astype(np.int64) - n_ws
        n_symbols = cnt(r"#|\.\.\.")
        n_alpha = cnt(r"\S*[A-Za-z]\S*")
        n_stop = np.zeros(len(f), dtype=np.int64)
        for w in self.stopwords:
            n_stop += pc.match_substring_regex(
                f, pattern=rf"\b{re.escape(w)}\b"
            ).to_numpy(zero_copy_only=False).astype(np.int64)
        flag_words = (n_words >= self.min_words) & (n_words <= self.max_words)
        flag_mean_len = (
            (n_words > 0)
            & (n_chars >= self.min_word_len * n_words)
            & (n_chars <= self.max_word_len * n_words)
        )
        sn, sd = self.symbol_ratio
        flag_symbol = sd * n_symbols <= sn * n_words
        an, ad = self.alpha_frac
        flag_alpha = ad * n_alpha >= an * n_words
        flag_stop = n_stop >= self.min_stopwords
        all_pass = flag_words & flag_mean_len & flag_symbol & flag_alpha & flag_stop
        base = self.output_col
        out = {
            f"{base}_n_words": n_words, f"{base}_n_chars": n_chars,
            f"{base}_n_symbols": n_symbols, f"{base}_n_alpha_words": n_alpha,
            f"{base}_n_stopwords": n_stop,
        }
        flags = {
            f"{base}_flag_words": flag_words, f"{base}_flag_mean_len": flag_mean_len,
            f"{base}_flag_symbol": flag_symbol, f"{base}_flag_alpha": flag_alpha,
            f"{base}_flag_stop": flag_stop, f"{base}_pass": all_pass,
        }
        nullify = pc.invert(valid)
        for name, arr in out.items():
            col = pc.if_else(nullify, pa.nulls(len(f), pa.int64()), pa.array(arr))
            batch = _append_or_replace(batch, name, col)
        for name, arr in flags.items():
            col = pc.if_else(nullify, pa.nulls(len(f), pa.bool_()), pa.array(arr))
            batch = _append_or_replace(batch, name, col)
        return batch

    @property
    def outputs(self):
        base = self.output_col
        return [f"{base}_{s}" for s in (
            "n_words", "n_chars", "n_symbols", "n_alpha_words", "n_stopwords",
            "flag_words", "flag_mean_len", "flag_symbol", "flag_alpha",
            "flag_stop", "pass")]


def gopher_oracle_exprs(text_expr: str, out_col: str, min_words: int = 50,
                        max_words: int = 100_000, min_word_len: int = 3,
                        max_word_len: int = 10,
                        symbol_ratio: tuple[int, int] = (1, 10),
                        alpha_frac: tuple[int, int] = (4, 5),
                        min_stopwords: int = 2,
                        stopwords: tuple[str, ...] = _GOPHER_STOPWORDS) -> tuple[str, str]:
    """(metrics select-list, flags select-list) computing the SAME Gopher
    metrics and exact-integer flags (oracle generation). The flag
    expressions reference the metric aliases, so select the metrics in a
    CTE and the flags from it (see the q_gopher oracle)."""
    t = text_expr
    b = out_col
    metrics = (
        rf"CAST(len(regexp_extract_all({t}, '\S+')) AS BIGINT) AS {b}_n_words, "
        rf"CAST(length({t}) - len(regexp_extract_all({t}, '\s')) AS BIGINT) AS {b}_n_chars, "
        rf"CAST(len(regexp_extract_all({t}, '#|\.\.\.')) AS BIGINT) AS {b}_n_symbols, "
        rf"CAST(len(regexp_extract_all({t}, '\S*[A-Za-z]\S*')) AS BIGINT) AS {b}_n_alpha_words, "
        + f"CAST(CASE WHEN {t} IS NULL THEN NULL ELSE ("
        + " + ".join(
            "CASE WHEN regexp_matches({}, '\\b{}\\b') THEN 1 ELSE 0 END".format(
                t, re.escape(w).replace(chr(39), chr(39) * 2))
            for w in stopwords)
        + f") END AS BIGINT) AS {b}_n_stopwords"
    )
    sn, sd = symbol_ratio
    an, ad = alpha_frac
    flags = (
        f"({b}_n_words >= {min_words} AND {b}_n_words <= {max_words}) AS {b}_flag_words, "
        f"({b}_n_words > 0 AND {b}_n_chars >= {min_word_len} * {b}_n_words "
        f"AND {b}_n_chars <= {max_word_len} * {b}_n_words) AS {b}_flag_mean_len, "
        f"({sd} * {b}_n_symbols <= {sn} * {b}_n_words) AS {b}_flag_symbol, "
        f"({ad} * {b}_n_alpha_words >= {an} * {b}_n_words) AS {b}_flag_alpha, "
        f"({b}_n_stopwords >= {min_stopwords}) AS {b}_flag_stop"
    )
    return metrics, flags


class TextNormalizeTransformer(Transformer):
    """Canonical text normalization — the first step of every web-corpus
    pipeline: optional Unicode normalization (``form`` = NFC/NFKC/NFD/NFKD),
    lowercasing, accent stripping (NFKD + remove combining marks),
    whitespace collapse (any ``\\s+`` run -> one space) and trim. Each step
    is independently switchable; steps apply in that order.

    Fully vectorized (Arrow utf8 kernels + RE2), stateless, no shuffle. The
    Unicode steps are certified against Python's independent
    ``unicodedata.normalize`` in tests; the SQL-expressible steps
    (lower/collapse/trim) have exact DuckDB parity and carry the oracle."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, form: str | None = None, lowercase: bool = True,
                 strip_accents: bool = False, collapse_whitespace: bool = True,
                 trim: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        if form is not None and form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError("form must be NFC|NFKC|NFD|NFKD|None")
        self.form = form
        self.lowercase = lowercase
        self.strip_accents = strip_accents
        self.collapse_whitespace = collapse_whitespace
        self.trim = trim

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))

        def kernel(flat):
            if self.form in ("NFD", "NFKD"):
                flat = pc.utf8_normalize(flat, form=self.form)
            elif self.form:
                # Arrow 16's utf8_normalize decomposes but never COMPOSES
                # (NFC('e\u0301') stays decomposed — verified), so the
                # composing forms go through CPython's C-implemented
                # unicodedata, one call per value (no hot inner loop; the
                # per-call cost is amortized over the document length)
                import unicodedata

                flat = pa.array(
                    [None if v is None else unicodedata.normalize(self.form, v)
                     for v in flat.to_pylist()],
                    pa.string(),
                )
            if self.lowercase:
                flat = pc.utf8_lower(flat)
            if self.strip_accents:
                flat = pc.utf8_normalize(flat, form="NFKD")
                flat = pc.replace_substring_regex(flat, pattern=r"\p{Mn}",
                                                  replacement="")
            if self.collapse_whitespace:
                flat = pc.replace_substring_regex(flat, pattern=r"\s+",
                                                  replacement=" ")
            if self.trim:
                flat = pc.utf8_trim_whitespace(flat)
            return flat

        out = A.lift(kernel, arr)
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class HashingVectorizerTransformer(Transformer):
    """Feature hashing (sklearn HashingVectorizer lineage): whitespace-split
    the text, hash every word into ``dim`` buckets, emit the fixed-size
    ``list<int64>`` bucket-count vector — text -> fixed-width model features
    with ZERO fitted state (no vocabulary pass, the property that makes it
    the 100-TB path when a vocab doesn't fit). Null text -> zero vector
    (treated as empty, SQL coalesce semantics).

    Bucket = poly31(word) % dim — the engine's SQL-certifiable codepoint
    polynomial (q_hash_encode family), vectorized off the UTF-8 buffers with
    distinct-once recompute for non-ASCII. Per-batch counting is one
    sort-free bincount over dense (row, bucket) codes; no shuffle."""

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, dim: int = 32, **kwargs):
        super().__init__(*args, **kwargs)
        if dim < 1:
            raise ValueError("dim must be >= 1")
        self.dim = int(dim)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        from kamae_ray.stages.hashing import poly31_column

        flat = A.as_array(self._cast_in(batch.column(self.input_col)))
        split = pc.split_pattern_regex(pc.fill_null(flat, ""), pattern=r"\s+")
        split = A._normalize_list(split)
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        words = split.values
        d = words.dictionary_encode()
        dvals = d.dictionary
        hv, _nm = poly31_column(dvals) if len(dvals) else (np.zeros(0, np.int64), None)
        buckets = hv % self.dim
        nonempty = (pc.utf8_length(dvals).to_numpy(zero_copy_only=False) > 0) \
            if len(dvals) else np.zeros(0, bool)
        widx = pc.fill_null(d.indices, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(flat)
        row_rep = np.repeat(np.arange(n), np.diff(offsets))
        keep = nonempty[widx] if len(dvals) else np.zeros(len(widx), bool)
        code = row_rep[keep] * self.dim + buckets[widx[keep]]
        mat = np.bincount(code, minlength=n * self.dim).astype(np.int64)[: n * self.dim]
        out = pa.FixedSizeListArray.from_arrays(pa.array(mat), self.dim)
        return _append_or_replace(batch, self.output_col, out)


class CharDiversityTransformer(Transformer):
    """Character-diversity quality score: inverse-Simpson concentration of
    the document's codepoint histogram — "effective alphabet size"
    ``n^2 / sum(c_i^2)`` — emitted in EXACT integer form (floor ppm) plus
    its integer evidence columns, so the score is hash-certifiable
    (lesson-24 family: no float accumulation on either engine). Catches
    low-diversity spam (repeated-character padding, single-char floods)
    that length or stopword gates miss; an O(bytes) sibling of
    RepetitionSignalsTransformer. No reference analog.

    Emits ``<out>_n_chars`` (codepoints counted; null text -> 0),
    ``<out>_s2`` (sum of squared per-codepoint counts) and ``<out>_ppm`` =
    ``floor(1e6 * n^2 / s2)`` (0 for empty docs; 1e6 = one distinct char,
    n*1e6 = all chars distinct).

    ASCII rows count straight off the Arrow UTF-8 buffers — a bincount of
    ``row_local_id * 256 + byte`` per bounded sub-chunk of rows (bounded so
    the histogram stays ~8 MB regardless of batch size); rows containing
    non-ASCII bytes fall back to a per-row codepoint Counter (rare in
    normalized web corpora)."""

    compatible_dtypes = (pa.string(),)
    _CHUNK_ROWS = 4096  # 4096*256 int64 bincount = 8 MB

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))

        flat = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        filled = pc.fill_null(flat, "")
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        n = len(filled)
        n_chars = np.zeros(n, np.int64)
        s2 = np.zeros(n, np.int64)
        if n:
            bufs = filled.buffers()
            width = np.int64 if pa.types.is_large_string(filled.type) else np.int32
            offsets = np.frombuffer(bufs[1], dtype=width)[filled.offset : filled.offset + n + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
            lens = offsets[1:] - offsets[:-1]
            if len(data):
                nac = np.concatenate([[0], np.cumsum((data >= 128).astype(np.int64))])
                ascii_row = (nac[offsets[1:]] - nac[offsets[:-1]]) == 0
            else:
                ascii_row = np.ones(n, bool)
            n_chars[:] = lens  # corrected below for non-ASCII rows
            good = np.flatnonzero(ascii_row & (lens > 0))
            for c0 in range(0, len(good), self._CHUNK_ROWS):
                rows = good[c0 : c0 + self._CHUNK_ROWS]
                rl = lens[rows]
                # gather each row's byte span: starts repeated + intra-row arange
                srep = np.repeat(offsets[rows], rl)
                intra = np.arange(int(rl.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(rl) - rl, rl
                )
                bytes_ = data[srep + intra].astype(np.int64)
                local = np.repeat(np.arange(len(rows), dtype=np.int64), rl)
                counts = np.bincount(local * 256 + bytes_, minlength=len(rows) * 256)
                counts = counts.reshape(len(rows), 256)
                s2[rows] = (counts * counts).sum(axis=1)
            bad = np.flatnonzero(~ascii_row)
            if len(bad):
                from collections import Counter

                for r, v in zip(bad, filled.take(pa.array(bad)).to_pylist()):
                    c = Counter(v)
                    n_chars[r] = sum(c.values())
                    s2[r] = sum(k * k for k in c.values())
        # exact floor ppm; rows whose n^2 * 1e6 would overflow int64 fold in
        # arbitrary-precision Python ints (docs beyond ~2M chars)
        ppm = np.zeros(n, np.int64)
        nz = s2 > 0
        small = nz & (n_chars <= 2_000_000)
        ppm[small] = (n_chars[small] * n_chars[small] * 1_000_000) // s2[small]
        for r in np.flatnonzero(nz & ~small):
            ppm[r] = (int(n_chars[r]) ** 2 * 1_000_000) // int(s2[r])
        base = self.output_col
        batch = _append_or_replace(batch, f"{base}_n_chars", pa.array(n_chars))
        batch = _append_or_replace(batch, f"{base}_s2", pa.array(s2))
        return _append_or_replace(batch, f"{base}_ppm", pa.array(ppm))


def char_diversity_oracle_sql(table: str, id_col: str, text_col: str, out: str) -> str:
    """GENERATED DuckDB oracle for CharDiversityTransformer — per-codepoint
    counts via string_split_regex (the '' artifact filtered), exact integer
    n / s2 / floor-div ppm."""
    return (
        f"WITH ch AS (SELECT {id_col}, unnest(list_filter(string_split_regex({text_col}, ''), "
        f"x -> x <> '')) AS c FROM {table}), "
        f"cc AS (SELECT {id_col}, c, COUNT(*) AS cnt FROM ch GROUP BY {id_col}, c), "
        f"s AS (SELECT {id_col}, SUM(cnt)::BIGINT AS n, SUM(cnt*cnt)::BIGINT AS s2 "
        f"FROM cc GROUP BY {id_col}) "
        f"SELECT d.{id_col}, COALESCE(s.n, 0) AS {out}_n_chars, "
        f"COALESCE(s.s2, 0) AS {out}_s2, "
        f"(CASE WHEN COALESCE(s.s2, 0) = 0 THEN 0 ELSE (s.n * s.n * 1000000) // s.s2 END)::BIGINT AS {out}_ppm "
        f"FROM {table} d LEFT JOIN s USING ({id_col})"
    )


def render_grouped_text(ds, group_cols, line_col: str, order_col: str,
                        sep: str = "\n", out_col: str = "rendered"):
    """Render each group's ordered lines into ONE text document — the
    structured-to-text serialization step of LLM training-data pipelines
    (user history -> prompt document, table rows -> document corpus): SQL
    ``string_agg(line, sep ORDER BY order_col)``.

    Deterministic only under a UNIQUE in-group order key (same contract as
    :func:`~kamae_ray.stages.aggregate.groupby_collect`, which provides the
    one sort-shuffle); the join itself is a vectorized Arrow
    ``binary_join`` over list offsets — no per-group Python. Null lines are
    dropped before collecting (string_agg semantics). Output: group
    columns + ``out_col`` + ``n_lines`` (int64).

    Scale plan: ONE key sort + block kernel; a group's document must fit in
    a block (the listwise contract)."""
    from kamae_ray.stages.aggregate import groupby_collect

    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def drop_null_lines(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(line_col)))

    drop_null_lines.__name__ = "render_drop_null_lines"
    src = drop_null_lines(ds) if isinstance(ds, pa.Table) else ds.map_batches(
        drop_null_lines, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    collected = groupby_collect(src, group_cols, line_col,
                                order_col=order_col, out_col="__lines")

    def join_lines(batch: pa.Table) -> pa.Table:
        lists = A.as_array(batch.column("__lines"))
        joined = pc.binary_join(lists, sep)
        n = pc.list_value_length(lists)
        cols = {g: batch.column(g) for g in group_cols}
        cols[out_col] = joined
        cols["n_lines"] = pc.cast(n, pa.int64())
        return pa.table(cols)

    join_lines.__name__ = "render_join_lines"
    if isinstance(collected, pa.Table):
        return join_lines(collected)
    return collected.map_batches(join_lines, batch_format="pyarrow",
                                 zero_copy_batch=True)


class ReadabilityTransformer(Transformer):
    """Flesch reading-ease estimate over raw text — the classic readability
    quality signal for corpus curation:

        flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    with vectorized RE2 counts shared verbatim with the oracle: words =
    ``\\S+`` runs, sentences = ``[.!?]+`` runs (floored at 1), syllables =
    ``[aeiouyAEIOUY]+`` vowel-group runs (the standard heuristic). The
    closing expression is a FIXED left-associative float chain over exact
    int64 counts with round-trip decimal literals (lesson 39: every
    literal CASTs to DOUBLE in the mirrored SQL). Emits ``{out}_words``,
    ``{out}_sentences``, ``{out}_syllables`` (int64) and ``{out}`` (the
    score, null for zero-word docs)."""

    compatible_dtypes = (pa.string(),)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(A.as_array(batch.column(self.input_col)),
                                   pa.string(), safe=False), "")
        w = pc.count_substring_regex(txt, pattern=r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = pc.count_substring_regex(txt, pattern=r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        syl = pc.count_substring_regex(txt, pattern=r"[aeiouyAEIOUY]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)
        bad = w == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            score = 206.835 - 1.015 * (w.astype(np.float64) / s.astype(np.float64)) \
                - 84.6 * (syl.astype(np.float64) / np.where(bad, 1, w).astype(np.float64))
        out = batch
        out = _append_or_replace(out, f"{self.output_col}_words", pa.array(w))
        out = _append_or_replace(out, f"{self.output_col}_sentences", pa.array(s))
        out = _append_or_replace(out, f"{self.output_col}_syllables", pa.array(syl))
        return _append_or_replace(out, self.output_col,
                                  pa.array(score, pa.float64(), mask=bad))

    @property
    def outputs(self) -> list[str]:
        return [f"{self.output_col}_words", f"{self.output_col}_sentences",
                f"{self.output_col}_syllables", self.output_col]


def lexical_stats(ds, id_col: str, text_col: str):
    """Per-document lexical statistics — the type-token-ratio family of
    corpus-quality signals: ``n_tok`` (whitespace tokens), ``n_types``
    (distinct tokens), ``n_hapax`` (tokens occurring exactly once in the
    doc) and ``ttr_ppm = n_types * 1e6 // n_tok`` (integer floor-div —
    cross-engine exact, no float). Zero-token docs are dropped (both the
    engine and the SQL oracle filter them).

    Shuffle-free: rows are independent. Per block, ONE dictionary-encode of
    the flat word values (lesson 12 — hash each distinct token once), one
    lexsort over (row, code) and run-boundary arithmetic produce every
    per-doc count; no per-row loop."""

    def kernel(block: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(A.as_array(block.column(text_col)),
                                   pa.string(), safe=False), "")
        words = A.drop_empty_tokens(
            pc.split_pattern_regex(txt, pattern=r"\s+"))
        lv, flat = A.unwrap(words)
        offsets = lv[0][0]
        lens = np.diff(offsets).astype(np.int64)
        n = len(lens)
        codes = pc.fill_null(flat.dictionary_encode().indices, -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        new = np.concatenate(([True], (r_s[1:] != r_s[:-1])
                              | (c_s[1:] != c_s[:-1]))) if len(r_s) else \
            np.zeros(0, bool)
        starts = np.nonzero(new)[0]
        run_lens = np.diff(np.concatenate((starts, [len(r_s)]))) \
            if len(starts) else np.zeros(0, np.int64)
        run_rows = r_s[starts] if len(starts) else np.zeros(0, np.int64)
        n_types = np.bincount(run_rows, minlength=n).astype(np.int64)
        n_hapax = np.bincount(run_rows[run_lens == 1],
                              minlength=n).astype(np.int64)
        keep = lens > 0
        ttr = np.zeros(n, np.int64)
        ttr[keep] = (n_types[keep] * 1_000_000) // lens[keep]
        out = pa.table({
            id_col: A.as_array(block.column(id_col)),
            "n_tok": pa.array(lens),
            "n_types": pa.array(n_types),
            "n_hapax": pa.array(n_hapax),
            "ttr_ppm": pa.array(ttr),
        })
        return out.filter(pa.array(keep))

    kernel.__name__ = "lexical_stats"
    if isinstance(ds, pa.Table):
        return kernel(ds)
    try:
        ds = ds.select_columns([id_col, text_col])
    except Exception:
        pass
    return ds.map_batches(kernel, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
