"""E3-E8 + E12/E13 — the extraction chain (reference src/crawler.ts:31-85)."""

from webscraper_ray.oracle.dom import parse_html
from webscraper_ray.oracle.extract import ExtractResult, extract, get_text_join


def page(body: str, head: str = "") -> str:
    return f"<html><head>{head}</head><body>{body}</body></html>"


URL = "https://example.com/a"


def test_title_from_h1():
    r = extract(URL, page("<div><h1> Hello World </h1><p>x</p></div>"))
    assert r.ok and r.title == "Hello World"


def test_title_fallback_h2_when_no_h1():
    r = extract(URL, page("<div><h2>Second</h2><p>body</p></div>"))
    assert r.ok and r.title == "Second"


def test_no_heading_fails_not_found():
    r = extract(URL, page("<p>no headings at all</p>"))
    assert not r.ok and r.err == "not found"
    assert r.url == URL  # canonical url still reported for dead-lettering


def test_multiple_h1_joined_with_space():
    r = extract(URL, page("<section><h1>One</h1><h1>Two</h1><p>tail</p></section>"))
    assert r.title == "One Two"


def test_og_title_overrides_h1_and_not_in_meta():
    head = (
        '<meta property="og:title" content=" OG Title ">'
        '<meta property="og:type" content="article">'
        '<meta property="article:author" content="Ann">'
        '<meta property="twitter:card" content="ignored">'
        '<meta name="description" content="no property -> ignored">'
    )
    r = extract(URL, page("<div><h1>DOM title</h1><p>text body here</p></div>", head))
    assert r.title == "OG Title"
    assert r.meta == {"og:type": "article", "article:author": "Ann"}
    assert "og:title" not in r.meta


def test_script_text_excluded_from_article_but_present_in_page():
    body = "<div><h1>T</h1><p>visible</p><script>var hidden = 1;</script></div>"
    r = extract(URL, page(body))
    assert "hidden" not in r.text
    assert "hidden" in r.page  # $.html() captured before script strip


def test_parent_expansion_until_threshold():
    # h1's immediate parent text is shorter than 2*len(title) -> expand up.
    body = (
        "<article><div><h1>Short</h1></div>"
        "<p>This sibling paragraph provides plenty of surrounding article "
        "text so the second-level container passes the threshold.</p></article>"
    )
    r = extract(URL, page(body))
    assert "sibling paragraph" in r.text


def test_expansion_stops_when_container_rich_enough():
    inner = "Long enough article body text right here in the direct parent container."
    body = f"<article><div><h1>T</h1><p>{inner}</p></div><p>outside text</p></article>"
    r = extract(URL, page(body))
    assert "outside text" not in r.text
    assert inner in r.text


def test_article_html_is_first_container_inner_html():
    body = "<div id='c'><h1>T</h1><p>one two three four five six seven</p></div>"
    r = extract(URL, page(body))
    assert r.article_html.startswith("<h1>")
    assert "</p>" in r.article_html


def test_text_invariant_shape():
    r = extract(URL, page("<div><h1>Ti</h1><p>Body text that is long enough.</p></div>"))
    title, _, rest = r.text.partition("\n")
    assert title == "Ti"
    assert "Body text" in rest


def test_title_newlines_normalized():
    r = extract(URL, page("<div><h1>A\nB</h1><p>some body text for container</p></div>"))
    assert r.title == "A B"  # setTitle: \n -> space, trim (src/db/model.ts:56-61)


def test_get_text_join_per_element_trim():
    doc = parse_html("<p> a </p><p> b c </p>")
    assert get_text_join(doc.select("p")) == "a b c"


def test_outlinks_only_valid_https_canonicalized():
    body = (
        "<div><h1>T</h1><p>body text long enough to stop expansion okay</p>"
        '<a href="https://Other.com/x?utm_s=1&b=2">l1</a>'
        '<a href="/relative">l2</a>'
        '<a href="http://insecure.com/">l3</a>'
        '<a href="mailto:a@b.c">l4</a></div>'
    )
    r = extract("https://example.com/dir/page", page(body))
    assert r.outlinks == [
        "https://other.com/x?b=2",
        "https://example.com/relative",
    ]


def test_extract_result_dataclass_defaults():
    r = ExtractResult(ok=False)
    assert r.meta == {} and r.outlinks == []


def test_deeply_nested_html_does_not_recurse_out():
    # untrusted web HTML: 5000-deep nesting must not hit the recursion limit
    deep = "<html><body><h1>D</h1>" + "<div>" * 5000 + "text" + "</div>" * 5000
    r = extract(URL, deep + "</body></html>")
    assert r.ok and "text" in r.text


def test_random_html_never_crashes():
    # fuzz: arbitrary tag soup must produce ok=True/False, never raise
    from hypothesis import given, settings, strategies as st

    fragments = st.lists(
        st.sampled_from(
            ["<div>", "</div>", "<h1>", "</h1>", "<p>", "</p>", "<a href='x'>",
             "</a>", "text ", "<script>js</script>", "< broken", "&amp;", "&bogus;",
             "<img src=y>", "<!-- c -->", "<table><tr><td>", "</td></tr></table>",
             "\x00", "é¿", "<meta property='og:title' content='t'>"]
        ),
        max_size=30,
    )

    @settings(max_examples=200, deadline=None)
    @given(fragments)
    def run(parts):
        r = extract(URL, "".join(parts))
        assert isinstance(r.ok, bool)
        if r.ok:
            assert r.text.startswith(r.title)

    run()
