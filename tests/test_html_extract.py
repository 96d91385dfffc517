"""HTML main-content extraction: boilerplate strip, DOM heuristics,
block→span mapping, and the format-sniffing Spark stage."""

from high_performance_docling_spark.kernels.html_extract import html_to_spans

MESSY = """<!DOCTYPE html><html><head><title>Site - Page</title>
<style>p{color:red}</style><script>track()</script></head>
<body>
<nav><a href="/">Home</a> | <a href="/about">About</a></nav>
<div id="cookie-banner">We use cookies. <a href="#">Accept</a></div>
<header><div class="menu"><a>One</a><a>Two</a></div></header>
<article>
  <h1>The Real Title</h1>
  <p>First paragraph of actual readable content with enough words.</p>
  <p>See <a href="x">this link</a> inside a real paragraph that stays.</p>
  <ul><li>alpha item</li><li>beta <br/>item</li></ul>
  <pre>x = compute(y)</pre>
  <figure><img src="img/fig1.png"/><figcaption>A figure caption</figcaption></figure>
  <table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>
  <p><a href="1">Prev</a> <a href="2">Next</a></p>
</article>
<aside class="related">You may also like <a href="#">this</a></aside>
<footer>Copyright 2024 <a href="#">terms</a></footer>
</body></html>"""


def test_boilerplate_stripped_and_blocks_mapped_in_order():
    got = [(s["order"], s["kind"], s["text"], s["media_ref"])
           for s in html_to_spans(MESSY)]
    assert got == [
        (0, "section_header", "The Real Title", ""),
        (1, "text", "First paragraph of actual readable content with enough words.", ""),
        (2, "text", "See this link inside a real paragraph that stays.", ""),
        (3, "list_item", "alpha item", ""),
        (4, "list_item", "beta item", ""),
        (5, "code", "x = compute(y)", ""),
        (6, "picture", "", "img/fig1.png"),
        (7, "caption", "A figure caption", ""),
        (8, "table", "a\tb\nc\td", ""),
    ]
    texts = " ".join(t for _, _, t, _ in got)
    # every boilerplate species is gone: script/style, nav, cookie banner,
    # menu header, link-only pager, related aside, footer
    for junk in ("track()", "Home", "cookies", "One", "Prev",
                 "also like", "Copyright"):
        assert junk not in texts


def test_link_density_rule_keeps_linky_but_texty_blocks():
    html = ("<body><p>lots of surrounding prose here with "
            "<a href='#'>a modest link</a> making under half the mass "
            "of this block</p>"
            "<p><a href='#'>all</a> <a href='#'>links</a></p></body>")
    spans = html_to_spans(html)
    assert len(spans) == 1 and spans[0]["text"].startswith("lots of")


def test_malformed_html_blocks_still_drain():
    spans = html_to_spans("<body><p>unclosed paragraph content here")
    assert [s["text"] for s in spans] == ["unclosed paragraph content here"]


def test_format_sniffing_stage_routes_pdf_and_html(spark):
    from high_performance_docling_spark.sources import (
        extract_fetched_documents,
        fetch_documents,
    )
    from tests.test_pdf_seam import _build_pdf

    pdf = _build_pdf()

    def fetcher(url):
        if url.endswith(".pdf"):
            return pdf
        if url.endswith(".html"):
            return MESSY.encode()
        return b"\x00\x01 garbage"

    manifest = spark.createDataFrame(
        [("p", "https://x/a.pdf"), ("h", "https://x/b.html"),
         ("g", "https://x/c.bin")],
        ["doc_id", "url"],
    )
    out = {
        r["doc_id"]: [(s["kind"], s["text"], s["order"]) for s in r["spans"]]
        for r in extract_fetched_documents(
            fetch_documents(manifest, fetcher=fetcher)
        ).collect()
    }
    assert out["p"][0] == ("section_header", "Engine Report", 0)
    assert out["h"][0] == ("section_header", "The Real Title", 0)
    assert out["g"][0][0] == "error"


def test_streaming_fetch_extract_equals_batch(spark, tmp_path):
    """stream_extract_fetched over a manifest feed produces exactly the
    batch path's spans (one code path, foreachBatch)."""
    from high_performance_docling_spark.sources import (
        extract_fetched_documents,
        fetch_documents,
    )
    from high_performance_docling_spark.streaming.extract import (
        stream_extract_fetched,
    )
    from tests.test_pdf_seam import _build_pdf

    pdf = _build_pdf()

    def fetcher(url):
        return pdf if url.endswith(".pdf") else MESSY.encode()

    rows = [(f"d{i}", f"https://x/{i}." + ("pdf" if i % 2 else "html"))
            for i in range(6)]
    manifest = spark.createDataFrame(rows, ["doc_id", "url"])
    mdir, odir, cdir = (str(tmp_path / d) for d in ("m", "o", "c"))
    manifest.coalesce(2).write.parquet(mdir)

    q = stream_extract_fetched(spark, mdir, odir, cdir, fetcher=fetcher)
    q.awaitTermination(120)

    def norm(df):
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                          for s in r["spans"]]
            for r in df.collect()
        }

    got = norm(spark.read.parquet(odir))
    want = norm(extract_fetched_documents(
        fetch_documents(manifest, fetcher=fetcher)))
    assert got == want and len(got) == 6


def test_void_tags_inside_stripped_subtrees_do_not_wedge_strip_mode():
    """r3 ADVICE (high): a non-self-closed <br>/<img>/<input> inside
    nav/header/footer/form used to increment strip depth forever."""
    cases = [
        "<nav>menu<br>more</nav><p>content paragraph here</p>",
        "<form><input type='text'></form><p>content paragraph here</p>",
        "<div class='ad'><img src='x.png'></div><p>content paragraph here</p>",
        "<header><a>x</a><hr><a>y</a></header><p>content paragraph here</p>",
    ]
    for h in cases:
        spans = html_to_spans(h)
        assert [s["text"] for s in spans] == ["content paragraph here"], h


def test_omitted_end_tags_inside_boilerplate_unwind_at_ancestor():
    # <p> with omitted </p> inside <nav>: </nav> must still exit strip mode
    h = "<nav><p>skip one<p>skip two</nav><p>kept content text</p>"
    assert [s["text"] for s in html_to_spans(h)] == ["kept content text"]


def test_optional_end_tags_keep_document_order():
    """r3 ADVICE (medium): <ul><li>a<li>b</ul> used to emit b before a."""
    h = ("<ul><li>alpha item one<li>beta item two</ul>"
         "<p>following paragraph text</p>")
    assert [(s["kind"], s["text"]) for s in html_to_spans(h)] == [
        ("list_item", "alpha item one"),
        ("list_item", "beta item two"),
        ("text", "following paragraph text"),
    ]
    # p-after-p and block-closes-p
    h2 = "<p>first paragraph text<p>second paragraph text<div>div block text</div>"
    assert [s["text"] for s in html_to_spans(h2)] == [
        "first paragraph text", "second paragraph text", "div block text"]
    # omitted </td>: sibling cells and rows still band correctly
    h3 = "<table><tr><td>a1<td>a2<tr><td>b1<td>b2</table>"
    assert html_to_spans(h3)[0]["text"] == "a1\ta2\nb1\tb2"


def test_stray_end_tag_is_ignored_not_block_closing():
    h = "<div>outer text <p>inner paragraph text</span> continues</p></div>"
    # </span> has no open match: the p block must keep accumulating
    assert [s["text"] for s in html_to_spans(h)] == [
        "inner paragraph text continues", "outer text"]


def test_nested_tables_flatten_into_outer():
    h = ("<body><table><tr><td>a</td><td>"
         "<table><tr><td>x</td></tr></table>"
         "</td></tr><tr><td>b</td></tr></table>"
         "<p>after the nested table text</p></body>")
    spans = html_to_spans(h)
    assert spans[0]["kind"] == "table"
    assert "a" in spans[0]["text"] and "x" in spans[0]["text"] \
        and "b" in spans[0]["text"]
    assert spans[1] == {"kind": "text", "text": "after the nested table text",
                        "media_ref": "", "order": 1}
