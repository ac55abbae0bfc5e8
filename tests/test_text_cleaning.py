"""operators/text_cleaning.py (PII redaction, boilerplate strip) and
operators/sampling.stratified_sample — value semantics + scan-stage plans."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from purescript_ifrit_spark.operators.sampling import stratified_sample
from purescript_ifrit_spark.operators.text_cleaning import (
    clean_text,
    redact_pii,
    strip_boilerplate,
)


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            Row(id=1, text="write to bob@corp.example or call +1 555-0199 now"),
            Row(id=2, text="docs at https://ex.example/a?user=x@y.zz ok"),
            Row(id=3, text="clean line\nAll rights reserved.\nanother line"),
            Row(id=4, text="no pii here"),
        ]
    )


class TestRedactPii:
    def test_all_kinds_redacted_with_counts(self, dirty):
        out = {r["id"]: r for r in redact_pii(dirty, "text").collect()}
        assert out[1]["text"] == "write to <EMAIL> or call <PHONE> now"
        assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
        assert out[4]["text"] == "no pii here"
        assert out[4]["n_url"] == out[4]["n_email"] == out[4]["n_phone"] == 0

    def test_url_stage_consumes_embedded_email(self, dirty):
        # the URL contains an @; after the URL stage nothing email-shaped
        # remains, so n_email must be 0 (staged counting contract)
        out = {r["id"]: r for r in redact_pii(dirty, "text").collect()}
        assert out[2]["text"] == "docs at <URL> ok"
        assert out[2]["n_url"] == 1 and out[2]["n_email"] == 0

    def test_kinds_subset(self, dirty):
        out = {
            r["id"]: r
            for r in redact_pii(dirty, "text", kinds=["email"]).collect()
        }
        assert out[1]["text"] == "write to <EMAIL> or call +1 555-0199 now"
        assert "n_url" not in out[1].asDict()

    def test_unknown_kind_rejected(self, dirty):
        with pytest.raises(ValueError):
            redact_pii(dirty, "text", kinds=["ssn"])

    def test_out_col_preserves_original(self, dirty):
        out = redact_pii(dirty, "text", out_col="clean", count_cols=False)
        r = {x["id"]: x for x in out.collect()}[1]
        assert "bob@corp.example" in r["text"] and "<EMAIL>" in r["clean"]


class TestStripBoilerplate:
    def test_drops_matching_lines_only(self, dirty):
        out = {r["id"]: r for r in strip_boilerplate(dirty, "text").collect()}
        assert out[3]["text"] == "clean line\nanother line"
        assert out[4]["text"] == "no pii here"

    def test_case_insensitive(self, spark):
        df = spark.createDataFrame([Row(id=1, text="a\nALL RIGHTS RESERVED\nb")])
        assert strip_boilerplate(df, "text").collect()[0]["text"] == "a\nb"


class TestCleanText:
    def test_composed_and_scan_stage(self, dirty):
        out = clean_text(dirty, "text")
        got = {r["id"]: r for r in out.collect()}
        assert got[3]["text"] == "clean line\nanother line"
        assert got[1]["n_email"] == 1
        plan = physical(out)
        assert "Exchange" not in plan  # pure projection
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def pop(self, spark):
        return spark.range(0, 4000).select(
            F.col("id"),
            F.when(F.col("id") % 4 == 0, "en")
            .when(F.col("id") % 4 == 1, "de")
            .when(F.col("id") % 4 == 2, "fr")
            .otherwise("zh")
            .alias("lang"),
        )

    def test_fractions_approximately_honored(self, pop):
        kept = stratified_sample(
            pop, "id", "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.0
        )
        counts = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert "fr" not in counts and "zh" not in counts  # default 0.0
        assert 400 < counts["en"] < 600      # ~500 of 1000
        assert 60 < counts["de"] < 140       # ~100 of 1000

    def test_monotone_in_fraction(self, pop):
        small = {
            r["id"]
            for r in stratified_sample(pop, "id", "lang", {"en": 0.2}).collect()
        }
        large = {
            r["id"]
            for r in stratified_sample(pop, "id", "lang", {"en": 0.6}).collect()
        }
        assert small <= large  # raising a fraction only ADDS rows

    def test_stable_under_repartition(self, pop):
        a = {
            r["id"]
            for r in stratified_sample(pop, "id", "lang", {"en": 0.3}).collect()
        }
        b = {
            r["id"]
            for r in stratified_sample(
                pop.repartition(13), "id", "lang", {"en": 0.3}
            ).collect()
        }
        assert a == b

    def test_full_fraction_keeps_all(self, pop):
        kept = stratified_sample(pop, "id", "lang", {"en": 1.0})
        assert kept.count() == 1000  # 1.0 means the whole stratum, exactly

    def test_validation(self, pop):
        with pytest.raises(ValueError):
            stratified_sample(pop, "id", "lang", {"en": 1.5})
        with pytest.raises(ValueError):
            stratified_sample(pop, "id", "lang", {}, default_fraction=-0.1)

    def test_scan_stage_plan(self, pop):
        plan = physical(stratified_sample(pop, "id", "lang", {"en": 0.5}))
        assert "Exchange" not in plan


class TestTermStats:
    def test_tf_and_df(self, spark):
        from purescript_ifrit_spark.operators.text_analysis import term_stats

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="The cat   sat"),
                Row(doc_id=2, text="cat CAT dog"),
                Row(doc_id=3, text=""),
            ]
        )
        got = {
            r["term"]: (r["tf"], r["df"])
            for r in term_stats(df, "doc_id", "text").collect()
        }
        # normalization lowercases + collapses whitespace; blank doc is no-op
        assert got == {"the": (1, 1), "cat": (3, 2), "sat": (1, 1), "dog": (1, 1)}

    def test_min_df_filters(self, spark):
        from purescript_ifrit_spark.operators.text_analysis import term_stats

        df = spark.createDataFrame(
            [Row(doc_id=1, text="a b"), Row(doc_id=2, text="a c")]
        )
        got = {r["term"] for r in term_stats(df, "doc_id", "text", min_df=2).collect()}
        assert got == {"a"}


class TestLabelCentroids:
    def test_exact_values(self, spark):
        from purescript_ifrit_spark.operators.similarity import label_centroids

        df = spark.createDataFrame(
            [
                Row(label=0, embedding=[1.0, 2.0]),
                Row(label=0, embedding=[3.0, 6.0]),
                Row(label=1, embedding=[10.0, 0.0]),
            ]
        )
        got = {
            (r["label"], r["dim"]): r["centroid"]
            for r in label_centroids(df, "label", "embedding").collect()
        }
        assert got == {(0, 0): 2.0, (0, 1): 4.0, (1, 0): 10.0, (1, 1): 0.0}

    def test_exact_grid_stable_under_repartition(self, spark, sf_dir):
        from purescript_ifrit_spark.operators.similarity import label_centroids
        from purescript_ifrit_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = label_centroids(emb, "label", "embedding", exact_grid=2**20)
        b = label_centroids(
            emb.repartition(7), "label", "embedding", exact_grid=2**20
        )
        ra = sorted(tuple(r) for r in a.collect())
        rb = sorted(tuple(r) for r in b.collect())
        assert ra == rb  # bit-identical: integer sums are order-independent


class TestDialectRedact:
    def test_redact_via_dialect_matches_expr(self, spark, dirty):
        from purescript_ifrit_spark.api import run_query
        from purescript_ifrit_spark.operators.text_cleaning import redact_expr

        got = run_query(spark, dirty, "SELECT id, REDACT(text) AS clean")
        want = dirty.select("id", redact_expr(F.col("text")).alias("clean"))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_redact_output_schema_is_string(self):
        from purescript_ifrit_spark.api import compile_query

        plan = compile_query(
            {"id": "number", "text": "string"},
            "SELECT REDACT(text) AS clean",
        )
        assert plan.output_schema.fields["clean"].kind == "string"


class TestTfidfTopk:
    def test_characteristic_term_wins(self, spark):
        from purescript_ifrit_spark.operators.text_analysis import tfidf_topk

        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="apple apple banana"),
                Row(doc_id=2, text="banana cherry"),
                Row(doc_id=3, text="banana dog"),
            ]
        )
        top1 = {
            r["doc_id"]: r["term"]
            for r in tfidf_topk(df, "doc_id", "text", k=1).collect()
        }
        # 'banana' appears in every doc (df=3) so unique terms win
        assert top1 == {1: "apple", 2: "cherry", 3: "dog"}

    def test_rejects_bad_k(self, spark):
        from purescript_ifrit_spark.operators.text_analysis import tfidf_topk

        df = spark.createDataFrame([Row(doc_id=1, text="a")])
        with pytest.raises(ValueError):
            tfidf_topk(df, "doc_id", "text", k=0)


class TestStratifiedFixedK:
    def test_exact_count_per_stratum(self, spark):
        from purescript_ifrit_spark.operators.sampling import stratified_fixed_k

        pop = spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("s")
        )
        kept = stratified_fixed_k(pop, "id", "s", 5)
        counts = {
            r["s"]: r["n"]
            for r in kept.groupBy("s").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"0": 5, "1": 5, "2": 5}

    def test_small_stratum_kept_whole(self, spark):
        from purescript_ifrit_spark.operators.sampling import stratified_fixed_k

        pop = spark.range(0, 3).select(F.col("id"), F.lit("only").alias("s"))
        assert stratified_fixed_k(pop, "id", "s", 10).count() == 3

    def test_stable_under_repartition(self, spark):
        from purescript_ifrit_spark.operators.sampling import stratified_fixed_k

        pop = spark.range(0, 200).select(
            F.col("id"), (F.col("id") % 2).cast("string").alias("s")
        )
        a = {r["id"] for r in stratified_fixed_k(pop, "id", "s", 7).collect()}
        b = {
            r["id"]
            for r in stratified_fixed_k(pop.repartition(9), "id", "s", 7).collect()
        }
        assert a == b

    def test_rejects_bad_k(self, spark):
        from purescript_ifrit_spark.operators.sampling import stratified_fixed_k

        pop = spark.range(1).select(F.col("id"), F.lit("s").alias("s"))
        with pytest.raises(ValueError):
            stratified_fixed_k(pop, "id", "s", 0)


def test_html_extract_known_document(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        extract_html_text,
    )

    html = (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Header One</h1><p>First &amp; second &lt;para&gt;.</p>"
        '<!-- hidden --><div>Block two&nbsp;here</div>'
        '<script>var x = "<p>not text</p>";</script>'
        "<ul><li>item one</li><li>item two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["id", "html"])
    out = extract_html_text(df, "html").collect()[0]["text"]
    assert out == (
        "T Header One\nFirst & second <para>.\nBlock two here\n"
        "item one\nitem two"
    )


def test_html_extract_matches_duckdb_twin(spark):
    import duckdb

    from purescript_ifrit_spark.operators.text_cleaning import (
        extract_html_text,
        html_text_sql,
    )

    cases = [
        "<p>multi<br>line<br/>breaks</p>",
        "no markup at all",
        '<SCRIPT SRC="x.js">alert(1)</SCRIPT>visible<STYLE>x</STYLE>',
        "&quot;quoted&quot; &#39;apos&#39; &amp;amp;",
        "",
        "<div><div><p>nested</p></div></div>trailing",
        "<p>unclosed tag soup <b>bold",
    ]
    df = spark.createDataFrame(list(enumerate(cases)), ["id", "html"])
    got = {r["id"]: r["text"] for r in extract_html_text(df, "html").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    want = dict(
        con.execute(f"SELECT id, {html_text_sql('html')} FROM t").fetchall()
    )
    assert got == want


def test_html_extract_cross_engine_fuzz(spark):
    """Randomized tag soup: the Spark expression and the DuckDB twin must
    agree byte-for-byte on arbitrary fragment combinations (seeded — the
    same 200 cases every run)."""
    import random

    import duckdb

    from purescript_ifrit_spark.operators.text_cleaning import (
        extract_html_text,
        html_text_sql,
    )

    rng = random.Random(42)
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<br/>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "&amp;", "&lt;", "&gt;", "&nbsp;", "&quot;", "&#39;",
        "plain words", "more text", "x<y", "a>b", "tab\there",
        "line\nbreak", "  spaces  ", "<h2>", "</h2>", "<unclosed",
        "<li>item</li>", "'quote'", '"dquote"',
    ]
    cases = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(list(enumerate(cases)), ["id", "html"])
    got = {r["id"]: r["text"] for r in extract_html_text(df, "html").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    want = dict(
        con.execute(f"SELECT id, {html_text_sql('html')} FROM t").fetchall()
    )
    mismatches = [i for i in got if got[i] != want[i]]
    assert not mismatches, (mismatches[:3], [cases[i] for i in mismatches[:3]])


def test_html_escaped_escapes_decode_once(spark):
    """'&amp;lt;' renders as the literal TEXT '&lt;' — a single-pass decode
    must produce that, never double-decode to '<' (the entity order bug:
    decoding &amp; before &lt; re-created a decodable entity)."""
    from purescript_ifrit_spark.operators.text_cleaning import (
        extract_html_text,
    )

    df = spark.createDataFrame(
        [(1, "<p>&amp;lt;b&amp;gt; is literal markup</p>")], ["id", "html"]
    )
    out = extract_html_text(df, "html").collect()[0]["text"]
    assert out == "&lt;b&gt; is literal markup"


def test_url_domain_stats_counts_docs_and_urls(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        url_domain_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "see http://A.example/x and http://a.example/y plain"),
            (2, "https://a.example:8080/z?q=1 and ftp://ignored.example"),
            (3, "no urls at all"),
            (4, "http://b.example/only"),
        ],
        ["doc_id", "text"],
    )
    got = {r["domain"]: (r["n_docs"], r["n_urls"])
           for r in url_domain_stats(df).collect()}
    # case-folded host; port kept out by the :-terminator; ftp ignored
    assert got == {"a.example": (2, 3), "b.example": (1, 1)}


def test_encoding_quality_counts(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        encoding_quality,
    )

    df = spark.createDataFrame(
        [
            (1, "clean ascii"),
            (2, "bad �� and \x07 bell"),
            (3, "café né"),            # 2 non-ascii, nothing else
            (4, ""),                   # empty: all zeros, ratio 0.0
            (5, "tab\tand\nnewline"),  # \t \n are NOT control hits
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert got[1]["n_replacement"] == 0 and got[1]["n_control"] == 0
    assert got[2]["n_replacement"] == 2 and got[2]["n_control"] == 1
    assert got[2]["n_non_ascii"] == 2  # the two U+FFFD are non-ascii too
    assert got[3]["n_non_ascii"] == 2 and got[3]["n_control"] == 0
    assert got[3]["non_ascii_ratio"] == 2 / 7
    assert got[4]["n_chars"] == 0 and got[4]["non_ascii_ratio"] == 0.0
    assert got[5]["n_control"] == 0


def test_normalize_unicode_forms(spark):
    import pytest

    from purescript_ifrit_spark.operators.text_cleaning import (
        normalize_unicode,
    )

    df = spark.createDataFrame(
        [(1, "café"),      # decomposed acute -> é under NFC
         (2, "ﬁne"),        # ligature fi: NFC keeps, NFKC folds
         (3, "plain ascii"),
         (4, None)],
        ["id", "t"],
    )
    nfc = {r.id: r.o for r in
           normalize_unicode(df, "t", "o", "NFC").collect()}
    assert nfc[1] == "café"
    assert nfc[2] == "ﬁne"          # compatibility chars untouched
    assert nfc[3] == "plain ascii"       # ASCII short-circuit: identity
    assert nfc[4] is None
    nfkc = {r.id: r.o for r in
            normalize_unicode(df, "t", "o", "NFKC").collect()}
    assert nfkc[2] == "fine"             # ligature folded
    nfd = {r.id: r.o for r in
           normalize_unicode(df, "t", "o", "NFD").collect()}
    assert nfd[1] == "café"        # NFD re-decomposes
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(df, "t", "o", "NFX")


def test_canonicalize_url_rules(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        canonicalize_urls,
    )

    cases = [
        (1, "HTTP://Example.COM:80/a/?utm_source=x&b=2&a=1#top",
         "http://example.com/a?a=1&b=2"),
        (2, "https://example.com:443/", "https://example.com/"),
        (3, "http://example.com:8080/x", "http://example.com:8080/x"),
        (4, "https://h.net", "https://h.net/"),          # bare root
        (5, "http://h.net/x?utm_source=a&gclid=1", "http://h.net/x"),
        (6, "ftp://example.com/x", None),                # non-http(s)
        (7, "plain text", None),
        (8, "http://h.net/x?b=1&b=1&a=", "http://h.net/x?a=&b=1&b=1"),
        (9, "HTTPS://H.net:80/x", "https://h.net:80/x"), # :80 on https kept
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], ["id", "url"]
    )
    got = {r.id: r.url_canon for r in canonicalize_urls(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_repair_mojibake_round_trip(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        repair_mojibake,
    )

    bad = "cafÃ©"                 # 'café' double-encoded
    cp1252_bad = "cafâ€œ"    # cp1252 image of U+201C quote
    cases = [
        (1, bad, "café"),                   # repaired (latin-1 range)
        (2, cp1252_bad, "caf“"),       # repaired via cp1252 (euro-range)
        (3, "café", "café"),                # genuine UTF-8: round-trip fails
        (4, "plain ascii", "plain ascii"),  # short-circuit
        (5, None, None),
        (6, "中文", "中文"),  # CJK: not encodable, untouched
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in cases], ["id", "t"])
    got = {r.id: r.o for r in repair_mojibake(df, "t", "o").collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_domain_blocklist_suffix_semantics(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        annotate_blocked_domains,
        filter_blocked_domains,
    )

    docs = spark.createDataFrame(
        [(1, "http://spam.example/x"),        # exact pattern
         (2, "https://a.b.spam.example/y"),   # subdomain
         (3, "http://notspam.example/z"),     # suffix of the STRING, not a label
         (4, "http://ok.net/w"),
         (5, "not a url"),
         (6, None)],
        ["doc_id", "url"],
    )
    bl = spark.createDataFrame([("spam.example",)], ["pattern"])
    ann = {r.doc_id: r for r in
           annotate_blocked_domains(docs, bl).collect()}
    assert ann[1].blocked and ann[2].blocked
    assert not ann[3].blocked            # label boundary respected
    assert not ann[4].blocked
    assert ann[5].domain == "" and not ann[5].blocked
    assert ann[6].domain == "" and not ann[6].blocked
    kept = sorted(r.doc_id for r in filter_blocked_domains(docs, bl).collect())
    assert kept == [3, 4, 5, 6]


def test_c4_line_filter_rules(spark):
    from purescript_ifrit_spark.operators.text_cleaning import c4_line_filter

    cases = [
        # (id, text, want_kept_lines, want_pass)
        (1, "Good first sentence here.\nshort.\nno terminal punct line\n"
            "Uses javascript heavily today.\nAnother good long sentence!",
         ["Good first sentence here.", "Another good long sentence!"], False),
        (2, "One fine line right here.\nSecond fine line is good.\n"
            "Third fine line stays too.", 3 * [None], True),
        (3, "A passing sentence number one.\nA passing sentence number two.\n"
            "A passing sentence number three.\nlorem ipsum dolor sit amet.",
         4 * [None], False),                      # lorem ipsum page flag
        (4, "Braces kill the page rule.\nSecond keeps the line count up.\n"
            "Third keeps the line count up.\nvar x = {", 3 * [None], False),
        (5, "", [], False),                        # empty doc
        (6, "  Trimmed line survives fine.  \nok?", 
         ["Trimmed line survives fine."], False),  # trim-first; 'ok?' 1 word
    ]
    df = spark.createDataFrame([(i, t) for i, t, *_ in cases], ["id", "t"])
    out = {r.id: r for r in c4_line_filter(df, "id", "t").collect()}
    assert out[1].text_c4.split("\n") == cases[0][2]
    assert out[1].n_kept == 2 and out[1].c4_pass is False
    assert out[2].n_kept == 3 and out[2].c4_pass is True
    assert out[3].n_kept == 4 and out[3].c4_pass is False
    assert out[4].c4_pass is False
    assert out[5].n_kept == 0 and out[5].text_c4 == "" and not out[5].c4_pass
    assert out[6].text_c4 == "Trimmed line survives fine."


def test_c4_crlf_corpus_matches_lf_on_all_three_backends(spark):
    """ADVICE r7: a \\n-only split left the trailing \\r of CRLF corpora
    on every line — Java's `$` matched before it (line passes) while the
    RE2/DuckDB twins' `$` did not (line fails), so the operator and its
    oracles disagreed on any \\r\\n corpus. Universal-newline split fixes
    it; this pins CRLF ≡ LF ≡ CR across operator, Spark-SQL twin, and
    the DuckDB oracle kernel."""
    import duckdb

    from purescript_ifrit_spark.operators.text_cleaning import (
        c4_line_filter,
        c4_pass_sql,
    )

    lf = ("First planted sentence has plenty of words.\n"
          "short line\n"
          "Second planted sentence also has plenty of words.\n"
          "Third planted sentence keeps the page flag alive.")
    variants = [(1, lf), (2, lf.replace("\n", "\r\n")),
                (3, lf.replace("\n", "\r"))]
    df = spark.createDataFrame(variants, ["id", "t"])
    rows = {r.id: r for r in c4_line_filter(df, "id", "t").collect()}
    for vid in (2, 3):
        assert rows[vid].n_lines == rows[1].n_lines, vid
        assert rows[vid].n_kept == rows[1].n_kept == 3, vid
        assert rows[vid].text_c4 == rows[1].text_c4, vid
        assert rows[vid].c4_pass is True, vid

    # Spark-SQL twin (the dialect C4PASS backend) on the same variants
    sql_pass = {
        r.id: r.p
        for r in spark.createDataFrame(variants, ["id", "t"])
        .selectExpr("id", c4_pass_sql("t") + " AS p")
        .collect()
    }
    assert sql_pass == {1: True, 2: True, 3: True}

    # DuckDB oracle kernel (suite _C4_KEEP_SQL) on the CRLF variant
    from purescript_ifrit_spark.suite.text import _C4_KEEP_SQL

    con = duckdb.connect()
    n = con.execute(
        "SELECT len(" + _C4_KEEP_SQL + ") FROM (SELECT ?::VARCHAR AS x)",
        [variants[1][1]],
    ).fetchone()[0]
    con.close()
    assert n == 3


def test_c4_line_filter_scan_stage(spark):
    # zero shuffle: the whole rule set is one codegen'd projection
    from purescript_ifrit_spark.operators.text_cleaning import c4_line_filter

    df = spark.createDataFrame([(1, "A line here now.")], ["id", "t"])
    plan = physical(c4_line_filter(df, "id", "t"))
    assert "Exchange" not in plan


def test_extract_links_rules(spark):
    from purescript_ifrit_spark.operators.text_cleaning import extract_links

    rows = [
        (1, '<a href="https://A.example/x?utm_source=s&z=1">One <i>two</i>\n'
            'three</a><a href="/r">rel</a>'),
        (2, "no links at all"),
        (3, None),
        (4, "<a href='https://singlequote.example/'>out of contract</a>"),
    ]
    df = spark.createDataFrame(rows, "id long, h string")
    out = [tuple(r) for r in
           extract_links(df, "id", "h").orderBy("id", "link_idx").collect()]
    assert out == [
        (1, 0, "https://A.example/x?utm_source=s&z=1", "One two three",
         "https://a.example/x?z=1"),
        (1, 1, "/r", "rel", None),
    ]  # docs 2-4 emit nothing (no links / NULL / unquoted contract)


def test_extract_links_scan_stage(spark):
    from purescript_ifrit_spark.operators.text_cleaning import extract_links

    df = spark.createDataFrame([(1, '<a href="https://e.x/">t</a>')],
                               "id long, h string")
    plan = extract_links(df, "id", "h")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_robots_filter_rep_semantics(spark):
    from pyspark.sql import functions as F
    from purescript_ifrit_spark.operators.text_cleaning import robots_filter

    rules = spark.createDataFrame(
        [
            ("a.com", "*", False, "/"),
            ("a.com", "*", True, "/pub"),
            ("b.com", "bot", False, "/x"),
            ("b.com", "*", False, "/"),      # shadowed by the bot group
            ("c.com", "*", False, "/t"),
            ("c.com", "*", True, "/t"),      # equal length -> allow wins
        ],
        "domain string, agent string, allow boolean, prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/pub/page"),   # longest match allow
            (2, "a.com", "/private"),    # falls to "/" disallow
            (3, "b.com", "/x/1"),        # bot group disallow
            (4, "b.com", "/y"),          # bot group has no match -> allowed
            (5, "c.com", "/t/z"),        # tie -> allow
            (6, "d.com", "/anything"),   # no rules -> allowed
        ],
        "doc_id long, domain string, path string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in robots_filter(urls, rules, "bot").collect()
    }
    assert got == {1: True, 2: False, 3: False, 4: True, 5: True, 6: True}


def test_robots_filter_single_join_single_agg(spark):
    from purescript_ifrit_spark.operators.text_cleaning import robots_filter

    rules = spark.createDataFrame(
        [("a.com", "*", False, "/")],
        "domain string, agent string, allow boolean, prefix string",
    )
    urls = spark.createDataFrame(
        [(1, "a.com", "/p")], "doc_id long, domain string, path string"
    )
    plan = robots_filter(urls, rules, "bot")._jdf.queryExecution() \
        .executedPlan().toString()
    # corpus side: one probe join (plus the rules-side scope join),
    # never a cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # r8 100x audit: an RDD-backed rules relation has no stats, so
    # without the explicit broadcast hint Spark SortMergeJoin'd — i.e.
    # shuffled the FULL url table on `domain`, a handful-of-values key
    # (worst-case skew at corpus scale). The probe join must broadcast
    # and the url side must reach it without any Exchange.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_markdown_sections_structure(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        markdown_sections,
    )

    md = ("intro line\n# Title One\nbody a\nbody b\n## Sub\nbody c\n"
          "####### not a heading\n#nospace")
    df = spark.createDataFrame(
        [(1, md), (2, ""), (3, None), (4, "plain only")],
        "doc_id long, text string",
    )
    rows = sorted(
        map(tuple, markdown_sections(df).collect()),
        key=lambda r: (r[0], r[1]),
    )
    assert rows == [
        (1, 0, None, None, "intro line", 1),
        (1, 1, 1, "Title One", "body a\nbody b", 2),
        # 7 hashes / missing space are NOT headings (ATX is 1-6 + space)
        (1, 2, 2, "Sub", "body c\n####### not a heading\n#nospace", 3),
        (4, 0, None, None, "plain only", 1),
    ]  # empty and NULL docs yield no rows


def test_markdown_sections_universal_newlines(spark):
    from purescript_ifrit_spark.operators.text_cleaning import (
        markdown_sections,
    )

    df = spark.createDataFrame(
        [(1, "intro\r\n# Title\r\nbody\r\n"), (2, "lead\r# CR Only\rtail")],
        "doc_id long, text string",
    )
    rows = {(r.doc_id, r.sec): r for r in markdown_sections(df).collect()}
    assert rows[(1, 1)].title == "Title"          # no trailing \r
    assert rows[(1, 1)].body == "body\n"          # CRLF at EOF -> empty tail line
    assert rows[(2, 1)].title == "CR Only"        # bare-CR heading detected
    assert rows[(2, 1)].body == "tail"
