"""C3 markdown conformance fixtures (VERDICT r3 #8).

Tricky CommonMark/GFM inputs vs the reference's ``marked.parse``
(``src/converting.ts:36-41``). Each case either MATCHES marked's
behavior (the widened subset: reference links, recursive blockquotes,
HTML blocks) or pins a DOCUMENTED DIVERGENCE — the divergent cases are
marked and assert our current, deliberate output so any silent behavior
change fails loudly.
"""

import pytest

from webscraper_ray.oracle.convert import convert_markdown, markdown_to_html


# --- reference-style links (CommonMark §6.3) — now IN subset ---------------

REF_CASES = [
    # (name, markdown, expected html)
    (
        "full_form",
        '[site][a]\n\n[a]: https://ex.com/x_y "Title"',
        '<p><a href="https://ex.com/x_y">site</a></p>',
    ),
    (
        "collapsed_form_case_insensitive",
        "[A B][]\n\n[a b]: http://e.co",
        '<p><a href="http://e.co">A B</a></p>',
    ),
    (
        "shortcut_form",
        "see [spec].\n\n[spec]: http://s.io",
        '<p>see <a href="http://s.io">spec</a>.</p>',
    ),
    (
        "undefined_label_stays_literal",
        "[nope][missing]",
        "<p>[nope][missing]</p>",
    ),
    (
        "angle_bracket_destination",
        "[x]\n\n[x]: <http://a.b/c>",
        '<p><a href="http://a.b/c">x</a></p>',
    ),
    (
        "first_definition_wins",
        "[d]\n\n[d]: http://first\n[d]: http://second",
        '<p><a href="http://first">d</a></p>',
    ),
    (
        "plain_brackets_not_links",
        "array[0] and [1,2]",
        "<p>array[0] and [1,2]</p>",
    ),
    (
        "definition_inside_code_fence_ignored",
        "```\n[x]: http://not-a-def\n```\n\n[x]",
        '<pre><code>[x]: http://not-a-def</code></pre><p>[x]</p>',
    ),
    (
        "inline_link_beats_reference",
        "[t](http://inline)\n\n[t]: http://ref",
        '<p><a href="http://inline">t</a></p>',
    ),
    (
        "emphasis_in_ref_link_text_not_url",
        "[*em* text][u]\n\n[u]: http://x_y_z",
        '<p><a href="http://x_y_z"><em>em</em> text</a></p>',
    ),
]


@pytest.mark.parametrize("name,md,want", REF_CASES, ids=[c[0] for c in REF_CASES])
def test_reference_links(name, md, want):
    assert markdown_to_html(md) == want


# --- blockquote recursion (CommonMark §5.1) — now IN subset ----------------

BQ_CASES = [
    (
        "list_inside_blockquote",
        "> - one\n> - two\n> tail",
        "<blockquote><ul><li>one</li><li>two</li></ul><p>tail</p></blockquote>",
    ),
    (
        "heading_and_nested_quote",
        "> # H\n> > inner quote\n> para",
        "<blockquote><h1>H</h1><blockquote><p>inner quote</p>"
        "</blockquote><p>para</p></blockquote>",
    ),
    (
        "outer_ref_resolves_inside_quote",
        "> go [here]\n\n[here]: http://q.r",
        '<blockquote><p>go <a href="http://q.r">here</a></p></blockquote>',
    ),
    (
        "fenced_code_inside_quote",
        "> ```py\n> x = 1\n> ```",
        '<blockquote><pre><code class="language-py">x = 1</code></pre></blockquote>',
    ),
]


@pytest.mark.parametrize("name,md,want", BQ_CASES, ids=[c[0] for c in BQ_CASES])
def test_blockquote_recursion(name, md, want):
    assert markdown_to_html(md) == want


def test_blockquote_depth_bomb_flattens_not_recurses():
    md = "> " * 40 + "deep"
    out = markdown_to_html(md)
    assert "deep" in out and out.count("<blockquote>") <= 17


# --- raw HTML blocks (CommonMark §4.6, simplified) — now IN subset ---------

def test_html_block_passthrough():
    md = '<div class="x">\n<span>hi</span>\n</div>\n\nafter'
    assert markdown_to_html(md) == '<div class="x">\n<span>hi</span>\n</div><p>after</p>'


def test_html_block_flows_into_tree_parser():
    # the passthrough must survive the full converter (tree grammar
    # sanitizes unknown tags but keeps the text)
    doc = convert_markdown(b"<blockquote><p>quoted html</p></blockquote>\n\nplain")
    texts = []

    def walk(n):
        if n.get("type") == "text":
            texts.append(n["text"])
        for c in n.get("content", []) or []:
            walk(c)

    walk(doc)
    assert "quoted html" in texts and "plain" in texts


# --- DOCUMENTED DIVERGENCES from marked ------------------------------------
# Each case pins OUR deliberate output; marked's differing output is noted.

def test_divergence_nested_sublists_flatten():
    """marked: '  - a1' nests a <ul> inside <li>a</li>. We FLATTEN
    indent-nested sublists into the parent list (documented in the
    markdown_to_html docstring)."""
    out = markdown_to_html("- a\n  - a1\n  - a2\n- b")
    assert out == "<ul><li>a</li><li>a1</li><li>a2</li><li>b</li></ul>"


def test_divergence_no_lazy_quote_continuation():
    """marked/CommonMark: a paragraph inside a quote lazily continues on
    an un-prefixed line ('> a\\nb' -> one quoted paragraph 'a b'). Ours
    ends the quote at the last '>' line; 'b' starts a new paragraph."""
    out = markdown_to_html("> a\nb")
    assert out == "<blockquote><p>a</p></blockquote><p>b</p>"


def test_divergence_setext_requires_adjacent_line():
    """CommonMark allows multi-line setext paragraph content; we promote
    only the accumulated paragraph, which matches marked for the common
    single-line case (pinned here)."""
    assert markdown_to_html("Title\n===") == "<h1>Title</h1>"
    assert markdown_to_html("Sub\n---") == "<h2>Sub</h2>"
    # '---' with no paragraph above is a thematic break, not a heading
    assert markdown_to_html("---") == "<hr>"
