"""HTML extraction (htmlx): stdlib-HTMLParser tokenization in one
Arrow UDF + relational jusText-lite boilerplate policy. Pins: block
boundaries, entity decoding, script/style skipping, byte-identical
binary decode (U+FFFD maximal subparts), title/links, malformed-HTML
tolerance, and the main-text good-block rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vrl_spark.operators import htmlx

PAGE = (
    "<html><head><title>My &amp; Page</title>"
    "<script>var x = '<p>not text</p>';</script>"
    "<style>p { color: red }</style></head>"
    "<body><h1>Header&#33;</h1>"
    "<p>First   paragraph\n with   spaces.</p>"
    "<div>Second <b>bold</b> block.</div>"
    "<nav><a href='/a'>Home</a> <a href='/b'>About</a> "
    "<a href='/c'>Contact</a></nav>"
    "<p>Real prose follows the navigation block and has a "
    "<a href='http://x.example/y'>link</a> inside it which stays.</p>"
    "</body></html>"
)


@pytest.fixture(scope="module")
def page_df(spark):
    return spark.createDataFrame(
        [(0, PAGE), (1, None)], ["doc_id", "html"]
    ).localCheckpoint()


def test_blocks_entities_and_skips(page_df):
    rows = page_df.select(
        "doc_id", htmlx.html_blocks(F.col("html")).alias("b")
    ).collect()
    by_id = {r.doc_id: r.b for r in rows}
    assert by_id[1] is None
    texts = [b.text for b in by_id[0]]
    assert texts == [
        "My & Page",
        "Header!",
        "First paragraph with spaces.",
        "Second bold block.",
        "Home About Contact",
        "Real prose follows the navigation block and has a link "
        "inside it which stays.",
    ]
    assert all("not text" not in t and "color" not in t for t in texts)
    nav = by_id[0][4]
    assert nav.link_chars == len("HomeAboutContact")  # anchors only
    assert nav.total_chars == len("Home About Contact")
    assert nav.link_chars / nav.total_chars > 0.8  # nav is link-dominated


def test_text_title_links(page_df):
    r = page_df.where("doc_id = 0").select(
        htmlx.html_text(F.col("html")).alias("t"),
        htmlx.html_title(F.col("html")).alias("title"),
        htmlx.html_links(F.col("html")).alias("links"),
    ).first()
    assert r.t.startswith("My & Page\nHeader!\nFirst paragraph")
    assert r.title == "My & Page"
    assert [(l.href, l.anchor) for l in r.links] == [
        ("/a", "Home"), ("/b", "About"), ("/c", "Contact"),
        ("http://x.example/y", "link"),
    ]


def test_binary_decode_byte_identical(spark):
    raw = "café <p>ok</p>".encode() + b"\xff\x80"  # invalid tail
    df = spark.createDataFrame([(0, raw)], "doc_id long, html binary")
    got = df.select(htmlx.html_text(F.col("html")).alias("t")).first().t
    want_decoded = raw.decode("utf-8", errors="replace")
    # same maximal-subpart replacement as bytes.decode: two U+FFFD
    assert want_decoded.count("�") == 2
    # blocks: "café" (cut by <p>), "ok" (cut by </p>), trailing "��"
    assert got == "café\nok\n��"


def test_malformed_html_no_crash(spark):
    ugly = "<p>open <div><b>nested</p> wrong </i> &brokenentity; <<< >"
    df = spark.createDataFrame([(0, ugly)], ["doc_id", "html"])
    t = df.select(htmlx.html_text(F.col("html")).alias("t")).first().t
    assert "open" in t and "nested" in t


def test_main_text_justext_lite(page_df, spark):
    out = htmlx.html_main_text(
        page_df, min_chars=25, max_link_density=0.5
    ).orderBy("doc_id").collect()
    assert out[1].main_text is None  # NULL page stays NULL
    mt = out[0].main_text
    # nav (link-dominated) and short blocks dropped; prose kept, in order
    assert "Home About Contact" not in mt
    assert "Header!" not in mt  # too short
    assert mt.index("First paragraph") < mt.index("Real prose")
    # stopword gate: demanding stopwords kills the stopword-free block
    sw = ["the", "and", "a", "it"]  # none occur in the first block
    gated = htmlx.html_main_text(
        page_df, min_chars=25, max_link_density=0.5,
        stopwords=sw, min_stopword_ratio=0.12,
    ).where("doc_id = 0").first().main_text
    assert "Real prose" in gated
    assert "First paragraph" not in gated  # no stopwords in that block
    # density counts OCCURRENCES over word tokens (distinct-counting
    # — array_intersect dedup — would score this block 3/13 and
    # wrongly drop it at the 0.35 bar), strips punctuation ('it.'
    # counts as 'it'), and matches case-insensitively on the
    # caller's list
    dens = spark.createDataFrame(
        [(0,
          "<p>so the cat sat by the mat and the dog slept near it.</p>")],
        ["doc_id", "html"],
    )
    got = htmlx.html_main_text(
        dens, min_chars=10, stopwords=["The", "and", "it"],
        min_stopword_ratio=0.35,  # 5 hits / 13 words = 0.385
    ).first().main_text
    assert "cat sat" in got
    got2 = htmlx.html_main_text(
        dens, min_chars=10, stopwords=["The", "and", "it"],
        min_stopword_ratio=0.45,  # above the true density -> dropped
    ).first().main_text
    assert got2 == ""
    # unicode tokenization: accented words are NOT shredded (bare
    # Java \W is ASCII-only; (?U) keeps 'été'/'à' whole) so a French
    # list scores French prose
    fr = spark.createDataFrame(
        [(0, "<p>l'été à paris a été très beau cette année là</p>")],
        ["doc_id", "html"],
    )
    got_fr = htmlx.html_main_text(
        fr, min_chars=10, stopwords=["été", "à", "a", "là", "l"],
        min_stopword_ratio=0.4,  # 6 hits / 11 words = 0.545
    ).first().main_text
    assert "paris" in got_fr
    # loud contracts: unreachable stopword entries and orphan ratios
    with pytest.raises(ValueError, match="single word tokens"):
        htmlx.html_main_text(
            fr, stopwords=["don't"], min_stopword_ratio=0.1
        )
    with pytest.raises(ValueError, match="requires a non-empty"):
        htmlx.html_main_text(fr, min_stopword_ratio=0.1)
    with pytest.raises(ValueError, match="min_stopword_ratio"):
        htmlx.html_main_text(fr, stopwords=["a"], min_stopword_ratio=3.0)
    # page with nothing kept -> '' (distinct from NULL page)
    tiny = spark.createDataFrame([(0, "<p>hi</p>")], ["doc_id", "html"])
    assert htmlx.html_main_text(tiny).first().main_text == ""
    with pytest.raises(ValueError, match="max_link_density"):
        htmlx.html_main_text(page_df, max_link_density=1.5)


def test_web_graph_from_raw_html(spark):
    """End-to-end composition the north star implies: raw HTML pages
    -> html_links (one parsing UDF) -> url_normalize (Catalyst
    canonicalizer) -> graph.pagerank over the host-level link graph.
    Pins that the extraction output feeds the existing relational
    lanes with no glue code beyond explode + select."""
    from pyspark.sql import functions as F

    from vrl_spark.operators import graph, urltools

    pages = spark.createDataFrame(
        [
            (0, "http://a.example/",
             "<a href='http://b.example/x'>b</a>"
             "<a href='http://c.example/y?z=1'>c</a>"),
            (1, "http://b.example/",
             "<a href='http://c.example/y'>c</a>"),
            (2, "http://c.example/",
             "<a href='http://a.example/#frag'>a</a>"),
        ],
        ["doc_id", "url", "html"],
    )
    edges = (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(htmlx.html_links(F.col("html"))).alias("l"),
        )
        .select(
            urltools.url_normalize(F.col("src_url")).alias("src_u"),
            urltools.url_normalize(F.col("l.href")).alias("dst_u"),
        )
        .select(
            F.parse_url(F.col("src_u"), F.lit("HOST")).alias("src"),
            F.parse_url(F.col("dst_u"), F.lit("HOST")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = graph.pagerank(edges, damping=0.85, iterations=30).collect()
    by_node = {r.node: r.rank for r in ranks}
    assert set(by_node) == {"a.example", "b.example", "c.example"}
    # at convergence c (linked by both a and b) outranks a (fed only
    # by c) which outranks b (fed only by half of a's mass)
    assert by_node["c.example"] > by_node["a.example"] > by_node["b.example"]
    assert abs(sum(by_node.values()) - 1.0) < 1e-9


def test_htmlx_over_pages_source(spark, sf_dir):
    """Smoke over the driver's actual pages derivation (html:binary
    from the documents table): every non-NULL page decodes, blocks
    carry positive char counts, and html_text equals the lossy byte
    decode modulo markup/whitespace (no char invented by extraction
    that the byte decode does not contain)."""
    from vrl_spark.plans.weblog import load_pages

    pages = load_pages(spark, sf_dir).limit(50).localCheckpoint()
    got = pages.select(
        "url",
        htmlx.html_text(F.col("html")).alias("t"),
        htmlx.html_blocks(F.col("html")).alias("b"),
    ).collect()
    assert len(got) == 50
    for r in got:
        if r.t is None:
            continue
        assert all(bl.total_chars > 0 for bl in r.b)
        assert all(0 <= bl.link_chars <= bl.total_chars for bl in r.b)
        assert "\n".join(bl.text for bl in r.b) == r.t
