"""String transformers (stateless), §2.8 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{string_affix,string_case,
string_concatenate,string_contains,string_contains_list,string_isin_list,
string_replace,string_list_to_string,string_to_string_list,
sub_string_delim_at_index,string_array_constant}.py

All are vectorized pyarrow.compute string kernels over flat values buffers.
"""

from __future__ import annotations

import re
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.stages.elementwise import MultiInputTransformer, UnaryKernelTransformer

_STR = (pa.string(),)


def _apply_per_distinct(x: pa.Array, params: list[pa.Array], kernel,
                        py_row, out_type: pa.DataType) -> pa.Array:
    """Distinct-once dispatch for two-column string kernels (CLAUDE.md
    lesson 12): factorize the parameter column(s) into dense group ids, run
    the VECTORIZED Arrow kernel once per DISTINCT parameter tuple over the
    gathered row subset, and scatter back with one permutation take. A
    low-cardinality pattern column (the practical case) costs one compiled
    kernel call per pattern instead of one Python call per row. Parameter
    columns with > rows/4 distinct tuples (gather overhead beats
    amortization) fall back to the per-row Python path. Null parameters and
    null inputs yield null."""
    from kamae_ray.functions import segments as S

    n = len(x)
    if n == 0:
        return pa.array([], out_type)
    tbl = pa.table({f"p{i}": a for i, a in enumerate(params)})
    gids = S.group_ids(tbl, list(tbl.column_names))
    order = np.argsort(gids, kind="stable")
    starts, lens = S.segments(gids[order])
    if len(starts) > max(64, n // 4):
        return py_row()
    pieces = []
    for s0, l0 in zip(starts, lens):
        sel = order[s0:s0 + l0]
        row0 = int(sel[0])
        pvals = [p[row0].as_py() for p in params]
        sub = x.take(pa.array(sel))
        if any(v is None for v in pvals):
            pieces.append(pa.nulls(len(sel), out_type))
        else:
            pieces.append(pc.cast(kernel(sub, *pvals), out_type, safe=False))
    cat = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                            for p in pieces])
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n, dtype=np.int64)
    return cat.take(pa.array(inv))


class StringAffixTransformer(UnaryKernelTransformer):
    """prefix + x + suffix. Reference: transformers/string_affix.py:177."""

    compatible_dtypes = _STR

    def __init__(self, *args, prefix: str = "", suffix: str = "", **kwargs):
        super().__init__(*args, **kwargs)
        self.prefix = prefix or ""
        self.suffix = suffix or ""

    def _kernel(self, flat):
        out = flat
        if self.prefix:
            out = pc.binary_join_element_wise(pa.scalar(self.prefix), out, pa.scalar(""))
        if self.suffix:
            out = pc.binary_join_element_wise(out, pa.scalar(self.suffix), pa.scalar(""))
        return out


class StringCaseTransformer(UnaryKernelTransformer):
    """upper/lower. Reference: transformers/string_case.py:157."""

    compatible_dtypes = _STR

    def __init__(self, *args, string_case_type: str = "upper", **kwargs):
        super().__init__(*args, **kwargs)
        if string_case_type not in ("upper", "lower"):
            raise ValueError("string_case_type must be upper|lower")
        self.string_case_type = string_case_type

    def _kernel(self, flat):
        return pc.utf8_upper(flat) if self.string_case_type == "upper" else pc.utf8_lower(flat)


class StringConcatenateTransformer(MultiInputTransformer):
    """Join N string cols with separator. Reference: transformers/string_concatenate.py:137."""

    compatible_dtypes = _STR

    def __init__(self, *args, separator: str = "_", **kwargs):
        super().__init__(*args, **kwargs)
        self.separator = separator

    def _fold(self, flats):
        return pc.binary_join_element_wise(*flats, pa.scalar(self.separator))


class StringContainsTransformer(Transformer):
    """Substring test vs constant or second col; optional negation.
    Reference: transformers/string_contains.py:148."""

    compatible_dtypes = _STR

    def __init__(self, *args, string_constant: str | None = None, negation: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.string_constant = string_constant
        self.negation = negation

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        if self.input_cols is not None:

            def fold(a, b):
                # distinct-once: one vectorized match_substring per DISTINCT
                # pattern value, scattered back with a permutation take
                def py_row():
                    av, bv = a.to_pylist(), b.to_pylist()
                    return pa.array(
                        [None if (x is None or y is None) else (y in x) for x, y in zip(av, bv)],
                        pa.bool_(),
                    )

                return _apply_per_distinct(
                    a, [b], lambda sub, p: pc.match_substring(sub, p), py_row, pa.bool_()
                )

            out = A.lift_multi(fold, [self._cast_in(batch.column(c)) for c in self.input_cols])
        else:
            arr = self._cast_in(batch.column(self.input_col))
            out = A.lift(lambda f: pc.match_substring(f, self.string_constant), arr)
        if self.negation:
            out = A.lift(pc.invert, out)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class StringContainsListTransformer(UnaryKernelTransformer):
    """True if ANY of constant list is a substring.
    Reference: transformers/string_contains_list.py:120."""

    compatible_dtypes = _STR

    def __init__(self, *args, string_constant_list: Sequence[str], negation: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.string_constant_list = list(string_constant_list)
        self.negation = negation

    def _kernel(self, flat):
        pat = "|".join(re.escape(s) for s in self.string_constant_list)
        out = pc.match_substring_regex(flat, pat)
        return pc.invert(out) if self.negation else out


class StringIsInListTransformer(UnaryKernelTransformer):
    """Exact membership in constant list. Reference: transformers/string_isin_list.py:117."""

    compatible_dtypes = _STR

    def __init__(self, *args, string_constant_list: Sequence[str], negation: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.string_constant_list = list(string_constant_list)
        self.negation = negation

    def _kernel(self, flat):
        out = pc.is_in(flat, value_set=pa.array(self.string_constant_list, pa.string()))
        return pc.invert(out) if self.negation else out


class StringReplaceTransformer(Transformer):
    """Regex replace (constant or column pattern/replacement).
    Reference: transformers/string_replace.py:262."""

    compatible_dtypes = _STR

    def __init__(
        self,
        *args,
        string_match_constant: str | None = None,
        string_replace_constant: str | None = None,
        regex: bool = True,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.string_match_constant = string_match_constant
        self.string_replace_constant = string_replace_constant
        self.regex = regex

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        if self.input_cols is not None:
            # [input, pattern?, replacement?] column forms
            cols = [self._cast_in(batch.column(c)) for c in self.input_cols]

            def fold(*flats):
                x = flats[0]
                it = iter(flats[1:])
                pat_arr = next(it) if self.string_match_constant is None else None
                rep_arr = next(it) if self.string_replace_constant is None else None
                n = len(x)
                params = [a for a in (pat_arr, rep_arr) if a is not None]

                def kernel(sub, *pv):
                    i = iter(pv)
                    p = next(i) if pat_arr is not None else self.string_match_constant
                    r = next(i) if rep_arr is not None else self.string_replace_constant
                    if self.regex:
                        # same RE2 kernel as the constant-pattern path (the
                        # old per-row python `re` fallback diverged from it
                        # on exotic syntax); RE2-rejected patterns fall back
                        # to python re for that distinct value only
                        try:
                            return pc.replace_substring_regex(sub, pattern=p, replacement=r)
                        except pa.ArrowInvalid:
                            return pa.array(
                                [None if v is None else re.sub(p, r, v) for v in sub.to_pylist()],
                                pa.string(),
                            )
                    return pc.replace_substring(sub, pattern=p, replacement=r)

                def py_row():
                    xs = x.to_pylist()
                    pats = pat_arr.to_pylist() if pat_arr is not None else [self.string_match_constant] * n
                    reps = rep_arr.to_pylist() if rep_arr is not None else [self.string_replace_constant] * n
                    return pa.array(
                        [
                            None if (xv is None or p is None or r is None)
                            else re.sub(p, r, xv) if self.regex else xv.replace(p, r)
                            for xv, p, r in zip(xs, pats, reps)
                        ],
                        pa.string(),
                    )

                if not params:  # both constants: shouldn't reach here, but stay safe
                    return kernel(x)
                return _apply_per_distinct(x, params, kernel, py_row, pa.string())

            out = A.lift_multi(fold, cols)
        else:
            arr = self._cast_in(batch.column(self.input_col))
            if self.regex:
                out = A.lift(
                    lambda f: pc.replace_substring_regex(
                        f, pattern=self.string_match_constant, replacement=self.string_replace_constant
                    ),
                    arr,
                )
            else:
                out = A.lift(
                    lambda f: pc.replace_substring(
                        f, pattern=self.string_match_constant, replacement=self.string_replace_constant
                    ),
                    arr,
                )
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class StringListToStringTransformer(Transformer):
    """Join innermost array<string> with delimiter.
    Reference: transformers/string_list_to_string.py:138."""

    compatible_dtypes = _STR

    def __init__(self, *args, separator: str = ",", **kwargs):
        super().__init__(*args, **kwargs)
        self.separator = separator

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))
        levels, flat = A.unwrap(arr)
        if not levels:
            raise TypeError("StringListToString requires a list<string> input")
        # join at innermost level: rebuild all but the last level
        inner_offsets, inner_validity = levels[-1]
        joined = pc.binary_join(
            A.rewrap([levels[-1]], flat), pa.scalar(self.separator)
        )
        out = A.rewrap(levels[:-1], joined)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class StringToStringListTransformer(Transformer):
    """Split by separator into fixed ``list_length`` with ``default_value``
    padding. Reference: transformers/string_to_string_list.py:209."""

    compatible_dtypes = _STR

    def __init__(self, *args, separator: str = ",", list_length: int, default_value: str = "", **kwargs):
        super().__init__(*args, **kwargs)
        self.separator = separator
        self.list_length = list_length
        self.default_value = default_value

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = self._cast_in(batch.column(self.input_col))

        def kernel(flat: pa.Array) -> pa.Array:
            split = pc.split_pattern(flat, pattern=self.separator)
            n = self.list_length
            sl = pc.list_slice(split, 0, n, return_fixed_size_list=False)
            # pad short lists
            lens = pc.list_value_length(sl).fill_null(0).to_numpy(zero_copy_only=False)
            pad_counts = (n - lens).clip(min=0)
            vals = sl.combine_chunks() if isinstance(sl, pa.ChunkedArray) else sl
            lv, fv = A.unwrap(vals)
            offsets, validity = lv[0]
            new_offsets = np.arange(len(lens) + 1, dtype=np.int64) * n
            out_vals = np.full(int(new_offsets[-1]), self.default_value, dtype=object)
            fvals = fv.to_pylist()
            pos = 0
            for i in range(len(lens)):
                ln = int(offsets[i + 1] - offsets[i])
                out_vals[i * n : i * n + min(ln, n)] = fvals[int(offsets[i]) : int(offsets[i]) + min(ln, n)]
            res = pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()),
                pa.array(list(out_vals), pa.string()),
                mask=pc.invert(validity) if validity is not None else None,
            )
            return res

        levels, flat = A.unwrap(arr)
        out = A.rewrap(levels, kernel(flat))
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class SubStringDelimAtIndexTransformer(UnaryKernelTransformer):
    """Split by delimiter, take element at index, default if out-of-bounds.
    Reference: transformers/sub_string_delim_at_index.py:201."""

    compatible_dtypes = _STR

    def __init__(self, *args, delimiter: str = ",", index: int = 0, default_value: str = "", **kwargs):
        super().__init__(*args, **kwargs)
        self.delimiter = delimiter
        self.index = index
        self.default_value = default_value

    def _kernel(self, flat):
        split = pc.split_pattern(flat, pattern=self.delimiter)
        lens = pc.list_value_length(split)
        elem = pc.list_slice(split, self.index, self.index + 1)
        joined = pc.binary_join(elem, pa.scalar(""))
        ok = pc.greater(lens, self.index)
        out = pc.if_else(ok, joined, pa.scalar(self.default_value))
        return pc.if_else(pc.is_valid(flat), out, pa.nulls(len(flat), pa.string()))


class StringArrayConstantTransformer(Transformer):
    """Inject a constant array<string> column. Reference:
    transformers/string_array_constant.py."""

    compatible_dtypes = None

    def __init__(self, *args, constant_string_array: Sequence[str], **kwargs):
        super().__init__(*args, **kwargs)
        self.constant_string_array = list(constant_string_array)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(self.constant_string_array)
        offsets = pa.array(np.arange(n + 1, dtype=np.int64) * k, pa.int32())
        values = pa.array(self.constant_string_array * n, pa.string())
        out = pa.ListArray.from_arrays(offsets, values)
        out = self._cast_out(out)
        return _append_or_replace(batch, self.output_col, out)


class EditDistanceTransformer(MultiInputTransformer):
    """Element-wise string distance of two string columns (int32), three
    modes, all byte-level (identical to DuckDB for ASCII), nulls as empty
    strings, every mode a batch-vectorized DP with no per-row Python
    (functions/editdist):

    - ``"levenshtein"`` — SQL ``levenshtein(a, b)`` (Wagner-Fischer).
    - ``"damerau"`` — SQL ``damerau_levenshtein(a, b)``: FULL unrestricted
      transpositions (Lowrance-Wagner), not OSA.
    - ``"hamming"`` — byte mismatches over the common prefix plus the
      length difference; equals SQL ``hamming(a, b)`` on equal lengths and
      extends it totally (DuckDB raises on unequal lengths).
    - ``"charset_jaccard"`` — exact integer ppm Jaccard of the distinct
      byte sets (both empty -> 1e6); SQL mirror via
      list_intersect/list_distinct over regexp_split_to_array.
    - ``"jaro"`` / ``"jaro_winkler"`` — float64 similarity BIT-identical
      to DuckDB's NATIVE jaro_similarity / jaro_winkler_similarity
      (floored transposition halves, 0.7-gated prefix boost) — an
      independent-implementation certification, not an expression mirror.

    No reference analog (kamae has no two-column string similarity); the
    fuzzy_join kernel family exposed as a transformer."""

    compatible_dtypes = _STR

    def __init__(self, *args, max_len: int = 128, mode: str = "levenshtein", **kwargs):
        super().__init__(*args, **kwargs)
        if self.input_cols is None or len(self.input_cols) != 2:
            raise ValueError("EditDistanceTransformer needs exactly two input_cols")
        if mode not in ("levenshtein", "damerau", "hamming", "charset_jaccard",
                        "jaccard_sim", "jaro", "jaro_winkler"):
            raise ValueError(f"unknown edit-distance mode {mode!r}")
        self.max_len = int(max_len)
        self.mode = mode

    def _fold(self, flats):
        from kamae_ray.functions import editdist

        if self.mode in ("jaro", "jaro_winkler"):
            return pa.array(editdist.jaro_winkler_pairwise(
                flats[0], flats[1], self.max_len,
                winkler=self.mode == "jaro_winkler"), pa.float64())
        if self.mode == "jaccard_sim":
            return pa.array(editdist.charset_jaccard_float_pairwise(
                flats[0], flats[1], self.max_len), pa.float64())
        fn = {
            "levenshtein": editdist.levenshtein_pairwise,
            "damerau": editdist.damerau_pairwise,
            "hamming": editdist.hamming_pairwise,
            "charset_jaccard": editdist.charset_jaccard_ppm_pairwise,
        }[self.mode]
        return pa.array(fn(flats[0], flats[1], self.max_len), pa.int32())


class Base64EncodeTransformer(UnaryKernelTransformer):
    """Standard base64 (RFC 4648, padded) of a string or binary column —
    the binary-feature serialization step (embedding blobs, image bytes,
    tokenized payloads into text-only sinks). Fully vectorized
    (functions/arrays.base64_encode: one 3-byte-group gather + bit ops +
    alphabet lookup); exactly DuckDB ``to_base64``. Nulls stay null. No
    reference analog (kamae has no binary serialization surface)."""

    compatible_dtypes = (pa.string(), pa.binary(), pa.large_binary())

    def _kernel(self, flat):
        return A.base64_encode(flat)


class Base64DecodeTransformer(UnaryKernelTransformer):
    """Strict base64 decode of a string column to binary (RFC 4648,
    padded) — inverse of :class:`Base64EncodeTransformer`, DuckDB
    ``from_base64`` parity; malformed input raises. Nulls stay null."""

    compatible_dtypes = (pa.string(),)

    def _kernel(self, flat):
        return A.base64_decode(flat)


class HexEncodeTransformer(UnaryKernelTransformer):
    """Uppercase hex of a string/binary column (two chars per byte, one
    vectorized lookup) — DuckDB ``hex(blob)`` parity. Nulls stay null."""

    compatible_dtypes = (pa.string(), pa.binary(), pa.large_binary())

    def _kernel(self, flat):
        return A.hex_encode(flat)


class SoundexTransformer(UnaryKernelTransformer):
    """Simplified American Soundex codes (the SQL translate-collapse
    variant: letters only, uppercase, consonant-class digits, adjacent
    duplicate codes collapsed before vowels drop — no H/W separator rule)
    — the classic phonetic blocking key for entity resolution; 4-char
    codes (``Robert -> R163``), letterless input -> ``''``, nulls null.
    Fully vectorized over the flat byte buffer (functions/editdist.
    soundex_column); the SQL mirror deduplicates via list ops (RE2 has no
    backreferences — a regex '(.)\\1+' collapse is silently a no-op)."""

    compatible_dtypes = _STR

    def _kernel(self, flat):
        from kamae_ray.functions.editdist import soundex_column

        return soundex_column(flat)


class JsonExtractTransformer(Transformer):
    """Extract one top-level scalar field from FLAT JSON strings — the
    event-properties column staple (``{"k": 87, "src": "web"}``-shaped
    payloads): emits the field's value as a string (strings unquoted and
    unescaped for the standard ``\\" \\\\ \\/`` escapes; numbers/booleans as
    their literal text; JSON ``null``, a missing field, or malformed input
    -> null). Semantics match DuckDB's ``json_extract_string`` on flat
    documents (certified in tests and by the q_json oracle, which uses
    DuckDB's INDEPENDENT native JSON parser, not a regex mirror) — with one
    documented divergence: numbers come back as their LITERAL source text
    (``-3.5e2``), while JSON engines normalize (``-350.0``); the two agree
    exactly on canonical integer/decimal literals.

    Fully vectorized — one RE2 ``extract_regex`` + two anchored rewrites per
    batch, no per-row Python, no shuffle. Scoped to FLAT documents: nested
    objects/arrays as the field's value and exotic escapes (\\uXXXX) are out
    of scope and pass through as raw text; use a real JSON engine for those.
    """

    compatible_dtypes = (pa.string(),)

    def __init__(self, *args, field: str, **kwargs):
        super().__init__(*args, **kwargs)
        if not field or re.search(r'["\\]', field):
            raise ValueError("field must be a plain key without quotes/backslashes")
        self.field = field

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        flat = A.as_array(self._cast_in(batch.column(self.input_col)))
        pat = (rf'"{re.escape(self.field)}"\s*:\s*'
               r'(?P<v>"(?:[^"\\]|\\.)*"|-?[0-9][0-9.eE+\-]*|true|false|null)')
        v = pc.struct_field(pc.extract_regex(flat, pattern=pat), "v")
        is_str = pc.starts_with(pc.fill_null(v, ""), '"')
        unq = pc.replace_substring_regex(v, pattern=r'^"|"$', replacement="")
        unq = pc.replace_substring_regex(unq, pattern=r'\\(["\\/])', replacement=r"\1")
        out = pc.if_else(is_str, unq, v)
        # JSON null -> SQL NULL — but only the BARE literal: a quoted "null"
        # string value stays the string 'null' (json_extract_string parity)
        bare_null = pc.and_(pc.invert(is_str),
                            pc.equal(pc.fill_null(out, ""), "null"))
        out = pc.if_else(bare_null, pa.nulls(len(flat), pa.string()), out)
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class UrlDomainTransformer(Transformer):
    """URL host/domain extraction + optional blocklist flag — the web-corpus
    provenance filter (C4/RefinedWeb lineage): emits ``<out>_host`` (the
    lowercased authority, userinfo/port/path stripped, leading ``www.``
    removed), ``<out>_domain`` (the last ``tld_levels`` dot-labels — a
    documented public-suffix-list APPROXIMATION: ``example.co.uk`` needs
    ``tld_levels=3``), and, when a ``blocklist`` is given, boolean
    ``<out>_blocked`` (domain membership, case-insensitive).

    Fully vectorized (one RE2 extract + rewrites + one ``index_in`` against
    the broadcast blocklist); stateless, no shuffle. Unparseable/null URLs
    -> null outputs (and null ``blocked`` — SQL three-valued logic)."""

    compatible_dtypes = (pa.string(),)
    _HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?(?:[^/@?#]*@)?(?P<h>[^/:?#]+)"

    def __init__(self, *args, tld_levels: int = 2,
                 blocklist: list[str] | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        if tld_levels < 1:
            raise ValueError("tld_levels must be >= 1")
        self.tld_levels = int(tld_levels)
        self.blocklist = [b.lower() for b in (blocklist or [])]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        flat = A.as_array(self._cast_in(batch.column(self.input_col)))
        host = pc.struct_field(pc.extract_regex(flat, pattern=self._HOST_RE), "h")
        host = pc.utf8_lower(host)
        host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
        # registered domain = last `tld_levels` labels of the host
        labels = pc.split_pattern(pc.fill_null(host, ""), pattern=".")
        # vectorized per-row tail slice (list_slice has no per-row start):
        # gather the last `tld_levels` labels with one flat take
        la = A._normalize_list(labels)
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        keep_n = np.minimum(lens, self.tld_levels)
        tstart = offs[1:] - keep_n
        total = int(keep_n.sum())
        row_off = np.concatenate(([0], np.cumsum(keep_n)))
        intra = np.arange(total) - np.repeat(row_off[:-1], keep_n)
        gathered = la.values.take(pa.array(np.repeat(tstart, keep_n) + intra))
        tail_list = pa.ListArray.from_arrays(pa.array(row_off, pa.int32()), gathered)
        domain = pc.binary_join(tail_list, ".")
        valid = pc.is_valid(host)
        domain = pc.if_else(valid, domain, pa.nulls(len(flat), pa.string()))
        base = self.output_col
        batch = _append_or_replace(batch, f"{base}_host", host)
        batch = _append_or_replace(batch, f"{base}_domain", domain)
        if self.blocklist:
            hit = pc.is_in(domain, value_set=pa.array(self.blocklist, pa.string()))
            hit = pc.if_else(valid, hit, pa.nulls(len(flat), pa.bool_()))
            batch = _append_or_replace(batch, f"{base}_blocked", hit)
        return batch

    @property
    def outputs(self):
        base = self.output_col
        out = [f"{base}_host", f"{base}_domain"]
        if self.blocklist:
            out.append(f"{base}_blocked")
        return out


class IpToIntTransformer(Transformer):
    """Dotted-quad IPv4 parsing: ``a.b.c.d`` -> the int64
    ``a*2^24 + b*2^16 + c*2^8 + d`` plus the /24 subnet prefix
    (``{out}_net24``) — the log-enrichment staple (geo/abuse joins key on
    the integer form). Strictly-invalid rows (not exactly 4 fields, a
    non-digit field, a value > 255, or an empty field) -> null, the SQL
    TRY_CAST semantics the oracle mirrors. Fully vectorized: one split +
    four casted field columns, no per-row loop."""

    compatible_dtypes = (pa.string(),)

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        arr = A.as_array(pc.cast(A.as_array(batch.column(self.input_col)),
                                 pa.string(), safe=False))
        split = A.as_array(pc.split_pattern(pc.fill_null(arr, ""), pattern="."))
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        ok = (lens == 4) & pc.is_valid(arr).to_numpy(zero_copy_only=False)
        flat = A.as_array(pc.list_flatten(split))
        digits = pc.match_substring_regex(flat, r"^\d{1,3}$") \
            .to_numpy(zero_copy_only=False)
        vals = np.zeros(len(flat), np.int64)
        if digits.any():
            good = flat.filter(pa.array(digits))
            vals[digits] = pc.cast(good, pa.int64()).to_numpy(zero_copy_only=False)
        vals = np.where(digits & (vals <= 255), vals, -1)
        # scatter the 4 fields of valid rows into a (n, 4) matrix
        n = len(arr)
        mat = np.full((n, 4), -1, np.int64)
        rows4 = np.flatnonzero(ok)
        if len(rows4):
            starts = np.cumsum(np.concatenate([[0], lens[:-1]]))
            for j in range(4):
                mat[rows4, j] = vals[starts[rows4] + j]
        valid = ok & (mat >= 0).all(axis=1)
        ip = (mat[:, 0] << 24) + (mat[:, 1] << 16) + (mat[:, 2] << 8) + mat[:, 3]
        out = batch
        out = _append_or_replace(out, self.output_col,
                                 pa.array(ip, pa.int64(), mask=~valid))
        net24 = ip >> 8
        return _append_or_replace(out, f"{self.output_col}_net24",
                                  pa.array(net24, pa.int64(), mask=~valid))

    @property
    def outputs(self) -> list[str]:
        return [self.output_col, f"{self.output_col}_net24"]
