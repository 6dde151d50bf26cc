"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting (SURVEY §2.9).

Everything is built-in `pyspark.sql.functions` (split/regexp/filter/
aggregate) — JVM expressions inside whole-stage codegen, zero Python UDFs —
so each operator is a narrow projection over a scan and scales linearly with
no shuffle at all (per-row ops) until an aggregate is asked for.

The module constants (stopwords, language markers) are shared with the
DuckDB oracle SQL in bigquack_spark.queries.text so both engines score with
identical lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Split pattern shared with the oracle (DuckDB string_split_regex uses the
#: same RE2-compatible pattern).
TOKEN_SPLIT = r"\s+"

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Tiny per-language marker vocabularies for the n-gram/stopword heuristic
#: language-ID.  Alphabetical language order is the deterministic tiebreak.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "wo", "ni"),
}


def tokens(text_col: str | Column) -> Column:
    """Lower-cased whitespace tokenization as an array column."""
    return F.split(F.lower(text_col), TOKEN_SPLIT)


def distinct_tokens(text_col: str | Column) -> Column:
    return F.array_distinct(tokens(text_col))


def _count_in(tok_array: Column, vocab: tuple[str, ...]) -> Column:
    """Number of tokens that appear in ``vocab`` — a higher-order filter,
    evaluated JVM-side per row."""
    lit_vocab = F.array(*[F.lit(v) for v in vocab])
    return F.size(F.filter(tok_array, lambda t: F.array_contains(lit_vocab, t)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row token statistics: counts, distinct counts, mean token length.

    Mean is an exact-int division (deterministic IEEE double) so it diffs
    cleanly against any other engine.
    """
    toks = tokens(text_col)
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("bigint"),
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "total_token_chars": F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            ),
        }
    ).withColumn(
        "avg_token_len",
        F.col("total_token_chars").cast("double") / F.col("n_tokens").cast("double"),
    )


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: alpha ratio, whitespace ratio, stopword
    ratio, plus a composite keep/drop flag.  All ratios are exact-int
    divisions."""
    toks = tokens(text_col)
    n_chars = F.length(text_col).cast("bigint")
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("bigint")
    space_chars = F.length(F.regexp_replace(F.col(text_col), "[^ ]", "")).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    stop_hits = _count_in(toks, STOPWORDS).cast("bigint")
    out = df.withColumns(
        {
            "n_chars_obs": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": alpha_chars.cast("double") / n_chars.cast("double"),
            "space_ratio": space_chars.cast("double") / n_chars.cast("double"),
            "stopword_ratio": stop_hits.cast("double") / n_tokens.cast("double"),
        }
    )
    return out.withColumn(
        "quality_pass",
        (F.col("n_tokens") >= 5)
        & (F.col("alpha_ratio") > 0.5)
        & (F.col("stopword_ratio") < 0.9),
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language marker-hit counts (columns ``hits_<lang>``)."""
    toks = tokens(text_col)
    return df.withColumns(
        {f"hits_{lang}": _count_in(toks, vocab).cast("int") for lang, vocab in sorted(LANG_MARKERS.items())}
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of marker hits, alphabetical tiebreak.

    Implemented as a greatest-of-structs comparison so the argmax is one
    codegen'd expression; the CASE-chain form in the oracle SQL encodes the
    identical (>=, alphabetical-first) semantics.
    """
    scored = lang_scores(df, text_col)
    langs = sorted(LANG_MARKERS)
    # struct(hits, neg_alpha_rank) max == argmax with alphabetical tiebreak:
    # put -index(lang) second so earlier alphabet wins ties.
    pairs = [
        F.struct(F.col(f"hits_{lang}").alias("h"), F.lit(-i).alias("o"), F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)
    ]
    return scored.withColumn("predicted_lang", F.greatest(*pairs).getField("lang"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized text plus an md5
    of the first-4-token prefix (cheap clustering key for near-dup triage)."""
    normalized = F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " "))
    toks = tokens(text_col)
    return df.withColumns(
        {
            "fingerprint": F.md5(normalized),
            "prefix_fingerprint": F.md5(F.array_join(F.slice(toks, 1, 4), " ")),
        }
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """Gopher-style compressibility signal: ``len(zlib(text)) / len(text)``
    — highly repetitive boilerplate compresses far below natural prose, so
    a low ratio flags template/spam documents that n-gram ratios can miss.

    This is the one text signal that genuinely needs Python (no zlib in
    SQL), so it runs as an Arrow-batched ``mapInPandas`` kernel — whole
    column batches cross the boundary, zlib is C-speed per document, and
    the result is deterministic (fixed level, no dictionary), covered by
    pytest rather than a SQL oracle.  Empty documents get ratio NULL."""
    import pandas as pd  # noqa: F401 (executor-side)

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} double"

    def kernel(batches):
        import zlib

        def ratio(t):
            if not isinstance(t, str) or not t:
                return None
            raw = t.encode("utf-8")  # encode once; it was paid twice per doc
            return len(zlib.compress(raw, level)) / len(raw)

        for pdf in batches:
            pdf[out_col] = [ratio(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def nfc_canonicalize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "canon_text",
) -> DataFrame:
    """Unicode NFC canonicalization — the normalization pass that must run
    BEFORE any hash-based dedup on real web text: composed ``é`` (U+00E9)
    and decomposed ``e`` + U+0301 are byte-different but canonically equal,
    so un-normalized fingerprints silently miss duplicates.

    Spark has no built-in Unicode-normalize expression, so this is an
    Arrow-batched ``mapInPandas`` kernel over ``unicodedata.normalize`` —
    whole column batches cross the boundary once, the per-document work is
    C-speed (CPython's unicodedata is a C module), and NFC is defined by
    the Unicode standard, so the output is engine-portable: DuckDB's
    ``nfc_normalize`` produces identical bytes (the q131 oracle relies on
    exactly that).  Pure per-row projection — zero shuffle, scales with
    the scan."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} string"

    def kernel(batches):
        import unicodedata

        for pdf in batches:
            pdf[out_col] = [
                unicodedata.normalize("NFC", t) if isinstance(t, str) else None
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


#: GPT-2-style pre-tokenizer pattern, restricted to the Java-regex ∩ RE2
#: dialect (the upstream pattern's \s+(?!\S) lookahead is dropped — RE2 has
#: no lookahead — so runs of whitespace stay single tokens; contraction
#: splits, leading-space word merging, and letter/number/punct runs match
#: the upstream behavior).  Probed identical on both engines including
#: contractions, unicode letters, and punctuation runs.
BPE_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer-fidelity token counting: the BPE-ish pre-tokenizer regex
    (SURVEY §2.9 'whitespace + a BPE-ish regex').  Whitespace counts
    under-bill punctuation-heavy and contraction-heavy text against a real
    BPE vocabulary; this pattern reproduces the GPT-2 pre-split, whose
    token count tracks actual BPE counts far more closely — the number a
    token-budget shard packer (pack_shards) should be fed.  Pure per-row
    projection, zero shuffle."""
    pieces = F.regexp_extract_all(text_col, F.lit(BPE_SPLIT), F.lit(0))
    non_ws = F.filter(pieces, lambda p: p.rlike(r"\S"))
    return df.withColumns(
        {
            "n_bpe_tokens": F.size(non_ws).cast("bigint"),
            "n_ws_tokens": F.size(F.split(F.trim(text_col), r"\s+")).cast("bigint"),
        }
    ).withColumn(
        "bpe_ws_ratio",
        F.round(F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens"), 6),
    )


WINNOW_K = 4   # tokens per rolling k-gram
WINNOW_W = 4   # winnowing window (guarantee: shared runs >= k+w-1 tokens share a fingerprint)
WINNOW_BASE = 131


def winnow_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprinting (Rabin-Karp + winnowing,
    Schleimer et al. 'Winnowing: Local Algorithms for Document
    Fingerprinting' — the MOSS algorithm): per-token 24-bit md5 hashes,
    polynomial rolling hash over ``WINNOW_K``-token windows (base 131,
    exact BIGINT — 24-bit hashes x 131^3 stay under 2^46, so NO modulus
    and both engines compute identical integers), then the minimum hash
    of each ``WINNOW_W`` window, deduplicated.  Any shared token run of
    length >= k+w-1 between two documents is GUARANTEED to share a
    fingerprint (the winnowing property), while local edits only perturb
    nearby fingerprints — the robust-to-edits triage key that whole-doc
    hashing (q53) lacks.  Pure per-row array projection; adds columns
    ``fps`` (array<bigint>), ``n_fps``."""
    staged = winnow_windows_frame(df, text_col, out_col="__winnow_wins")
    fps = F.array_distinct(F.col("__winnow_wins"))
    return staged.withColumns(
        {"fps": fps, "n_fps": F.size(fps).cast("bigint")}
    ).drop("__winnow_wins")


def winnow_windows_frame(
    df: DataFrame, text_col: str = "text", out_col: str = "wins"
) -> DataFrame:
    """Attach the positional winnowing sequence as ``out_col``: one
    ``array<bigint>`` element per winnowing window, IN ORDER (index i =
    the fingerprint selected at window position i), duplicates preserved.
    Callers that only triage docs use the deduplicated ``fps``; span-level
    consumers (q247's MOSS-style pair report) need the positions.

    Frame-shaped ON PURPOSE (r13, guide §1.2 "the distributed algorithm
    first"): the per-token hash array and the rolling-hash array are staged
    as their own projected columns, each referenced as a bound ATTRIBUTE by
    the next stage.  The previous single-Column form inlined the whole
    upstream expression at every reference — higher-order lambdas are not
    covered by codegen subexpression elimination, so each ``get(h, i)``
    re-ran the full per-token md5 transform and each window's ``slice``
    re-ran the full rolling fold: superlinear re-evaluation that clocked
    q139 at 51 s on the SMALLEST test factor.  Catalyst's CollapseProject
    keeps multi-referenced non-cheap aliases staged, so each array now
    computes exactly once per row (plan-asserted in tests/test_ops.py)."""
    k, w, b = WINNOW_K, WINNOW_W, WINNOW_BASE
    toks = F.split(F.lower(text_col), r"\s+")
    h = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 6), 16, 10).cast("bigint")
    )
    hh = F.col("__winnow_h")
    n_roll = F.size(hh) - (k - 1)  # rolling hashes available
    roll = F.when(
        F.size(hh) >= k,
        F.transform(
            F.sequence(F.lit(0), n_roll - 1),
            lambda i: (
                (F.get(hh, i) * b + F.get(hh, i + 1)) * b + F.get(hh, i + 2)
            ) * b + F.get(hh, i + 3),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    rr = F.col("__winnow_roll")
    wins = F.when(
        F.size(rr) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(rr) - w),
            lambda i: F.array_min(F.slice(rr, i + 1, w)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        df.withColumn("__winnow_h", h)
        .withColumn("__winnow_roll", roll)
        .withColumn(out_col, wins)
        .drop("__winnow_h", "__winnow_roll")
    )


# -- BPE trainer (r7 verdict #6) ---------------------------------------------

#: Symbol-sequence delimiters for the BPE merge loop: every symbol is
#: wrapped as SOSsymEOS, so "merge pair (a, b)" is a plain string replace
#: of SOS+a+EOS+SOS+b+EOS — non-overlapping left-to-right, exactly the
#: greedy BPE merge semantics — with no false match across symbol
#: boundaries (the naive space-separated encoding loses its shared
#: delimiter to the first replacement: " a a a " -> " aa a", dropping the
#: second merge of [a,a,a,a]).  Tokens containing the control chars are
#: excluded up front.
BPE_SOS = "\x01"
BPE_EOS = "\x02"


def _bpe_word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): each distinct token as a wrapped-symbol string of its
    characters, weighted by corpus frequency.  This is the scale move of
    BPE training — every later round works on the VOCABULARY (bounded,
    ~1M rows at 100 TB), not the corpus."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).filter(
        (F.length("tok") > 0)
        & ~F.col("tok").contains(BPE_SOS)
        & ~F.col("tok").contains(BPE_EOS)
    )
    wrapped = F.regexp_replace("tok", "(.)", f"{BPE_SOS}$1{BPE_EOS}")
    return toks.groupBy(wrapped.alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )


def _bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, n_occurrences): adjacent symbol pairs over a
    ``(w, freq)`` word table, weighted by word frequency — one explode +
    one aggregate whose shuffle is bounded by the pair vocabulary, not
    the corpus."""
    words = words.withColumn(
        "__syms",
        F.regexp_extract_all(
            F.col("w"), F.lit(f"{BPE_SOS}([^{BPE_EOS}]*){BPE_EOS}"), F.lit(1)
        ),
    )
    pairs = words.select(
        "freq",
        F.explode(
            # CASE guards the 1-symbol word: Spark's sequence(1, 0) counts
            # DOWN ([1, 0]), it does not return an empty array
            F.expr(
                "CASE WHEN size(__syms) < 2 THEN "
                "  CAST(array() AS array<struct<left:string,right:string>>) "
                "ELSE transform(sequence(1, size(__syms) - 1), "
                "  i -> struct(__syms[i - 1] AS left, __syms[i] AS right)) END"
            )
        ).alias("p"),
    ).select("freq", "p.left", "p.right")
    return pairs.groupBy("left", "right").agg(
        F.sum("freq").cast("long").alias("n_occurrences")
    )


def train_bpe(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """Byte-pair-encoding tokenizer training (corpus-scale tokenizer
    induction — the loop q146 runs ONE round of): ``n_merges`` rounds of
    count-adjacent-pairs -> pick the most frequent (ties broken (left,
    right) lexicographic, deterministic cross-engine) -> merge it greedily
    left-to-right in every vocabulary word.

    Returns the merge table as a DataFrame: (round, left, right, merged,
    n_occurrences) — the artifact a BPE tokenizer ships.  Stops early
    when no adjacent pair remains (every word fused to one symbol).

    Scale shape: the corpus is read ONCE into a frequency-weighted word
    table (vocabulary-bounded); each round is one explode + one
    pair-vocabulary-bounded aggregate + a 1-row collect (the argmax),
    and the merge itself is a per-row string replace.  The word table is
    cached and re-materialized per round so the plan stays flat across
    rounds instead of nesting ``n_merges`` transforms."""
    spark = df.sparkSession
    words = _bpe_word_table(df, text_col).cache()
    words.count()
    merges: list[tuple] = []
    try:
        for rnd in range(1, n_merges + 1):
            best = (
                _bpe_pair_counts(words)
                .orderBy(F.desc("n_occurrences"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            merges.append((rnd, b.left, b.right, b.left + b.right, b.n_occurrences))
            pat = f"{BPE_SOS}{b.left}{BPE_EOS}{BPE_SOS}{b.right}{BPE_EOS}"
            rep = f"{BPE_SOS}{b.left}{b.right}{BPE_EOS}"
            nxt = words.withColumn(
                "w", F.replace(F.col("w"), F.lit(pat), F.lit(rep))
            ).cache()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return spark.createDataFrame(
        merges or [],
        "round int, left string, right string, merged string, n_occurrences long",
    )


def encode_bpe(
    df: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """Apply a trained merge table (:func:`train_bpe`'s output rows, or
    any iterable with ``left``/``right`` fields in merge order) to every
    document and count its BPE tokens — the trained-tokenizer token
    count a pack sizer (sinks/packing.py) should be fed once a real
    vocabulary exists (``bpe_token_count``'s regex is the pre-training
    proxy).

    One projection, zero shuffle: each token's wrapped-symbol string
    runs the merge chain as ``n_merges`` sequential literal replaces
    (same greedy left-to-right semantics as training), then symbols are
    counted per token and summed per document.  Adds ``n_bpe_tokens``
    (symbol count over all tokens) and ``n_words`` columns."""
    tok_arr = F.filter(
        tokens(F.col(text_col)),
        lambda t: (F.length(t) > 0)
        & ~t.contains(BPE_SOS)
        & ~t.contains(BPE_EOS),
    )
    wrapped = F.transform(
        tok_arr,
        lambda t: F.regexp_replace(t, "(.)", f"{BPE_SOS}$1{BPE_EOS}"),
    )
    def _replacer(pat: str, rep: str):
        # a closure, not default args: PySpark counts a lambda's default
        # parameters toward the higher-order function's arity
        return lambda w: F.replace(w, F.lit(pat), F.lit(rep))

    def _field(m, name):
        return getattr(m, name) if hasattr(m, name) else m[name]

    # merges MUST apply in training order — sort by round when present
    # rather than trusting the caller's row order
    merges = sorted(
        merges,
        key=lambda m: _field(m, "round") if hasattr(m, "round") or (
            isinstance(m, dict) and "round" in m
        ) else 0,
    )
    merged = wrapped
    for m in merges:
        left = _field(m, "left")
        right = _field(m, "right")
        merged = F.transform(
            merged,
            _replacer(
                f"{BPE_SOS}{left}{BPE_EOS}{BPE_SOS}{right}{BPE_EOS}",
                f"{BPE_SOS}{left}{right}{BPE_EOS}",
            ),
        )
    n_syms = F.aggregate(
        F.transform(
            merged,
            lambda w: F.size(
                F.regexp_extract_all(
                    w, F.lit(f"{BPE_SOS}([^{BPE_EOS}]*){BPE_EOS}"), F.lit(1)
                )
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.withColumns(
        {
            "n_words": F.size(tok_arr).cast("long"),
            "n_bpe_tokens": n_syms.cast("long"),
        }
    )


def encode_bpe_trained(
    df: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """Vocabulary-scale twin of :func:`encode_bpe` (r8 verdict #2): apply
    a trained merge table of ANY size — a production tokenizer ships ~32k
    merges, and ``encode_bpe``'s ``n_merges`` nested Catalyst replaces
    cannot compile past a few dozen.  Adds the same ``n_words`` /
    ``n_bpe_tokens`` columns.  One deliberate divergence: a NULL text
    yields NULL counts here, where ``encode_bpe`` reports ``n_words=-1``
    (Spark's legacy ``size(NULL)`` sentinel) — NULL is the honest answer.

    The merge table ships to executors ONCE as a rank dict inside an
    Arrow-batched ``mapInPandas`` kernel (the ``compression_ratio``
    pattern — Python only where Python is required).  Each distinct token
    encodes with the standard min-rank loop: repeatedly merge the
    lowest-rank adjacent pair, all occurrences left-to-right.  This is
    provably identical to ``encode_bpe``'s sequential-replace semantics
    on any :func:`train_bpe` output: every symbol is produced by exactly
    one rule, so a rule's pair can only ever re-form from outputs of
    strictly EARLIER rules — by induction no earlier-rank pair appears
    after its rank has passed, hence min-rank order == training order
    (pinned by the pytest parity suite rather than a SQL oracle; a 32k
    expression tree has no oracle to diff against).

    Scale shape: pure per-row projection, zero shuffle; per-batch
    memoization collapses the Zipf-heavy token distribution (each
    distinct token encodes once per batch); the rank dict is
    vocabulary-bounded memory per executor — the same footprint a real
    tokenizer's vocab file costs."""

    def _field(m, name):
        return getattr(m, name) if hasattr(m, name) else m[name]

    def _round(m):
        if hasattr(m, "round") or (isinstance(m, dict) and "round" in m):
            return _field(m, "round")
        return 0

    ranks: dict[tuple[str, str], int] = {}
    for i, m in enumerate(sorted(merges, key=_round)):
        ranks.setdefault((_field(m, "left"), _field(m, "right")), i)

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, n_words bigint, n_bpe_tokens bigint"

    def kernel(batches):
        import re

        # ASCII \s matches Java's default (Spark's split) — Python's
        # Unicode \s would also split on NBSP etc. and drift tokenization
        split_re = re.compile(r"\s+", re.ASCII)
        memo: dict[str, int] = {}

        def n_symbols(tok: str) -> int:
            n = memo.get(tok)
            if n is not None:
                return n
            syms = list(tok)
            while len(syms) > 1:
                best_rank = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank = r
                        left, right = syms[i], syms[i + 1]
                if best_rank is None:
                    break
                out, i = [], 0
                while i < len(syms):  # all occurrences, left-to-right
                    if (
                        i < len(syms) - 1
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[tok] = len(syms)
            return len(syms)

        for pdf in batches:
            n_words, n_bpe = [], []
            for t in pdf[text_col]:
                if not isinstance(t, str):
                    n_words.append(None)
                    n_bpe.append(None)
                    continue
                toks = [
                    w
                    for w in split_re.split(t.lower())
                    if w and BPE_SOS not in w and BPE_EOS not in w
                ]
                n_words.append(len(toks))
                n_bpe.append(sum(n_symbols(w) for w in toks))
            pdf["n_words"] = n_words
            pdf["n_bpe_tokens"] = n_bpe
            yield pdf

    return df.mapInPandas(kernel, out_schema)
