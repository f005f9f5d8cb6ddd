"""E9-E11, E15 — tree parse/amend/serialize (reference src/tiptap.ts)."""

import json

from webscraper_ray.oracle.cbor import dumps, loads
from webscraper_ray.oracle.tree import (
    Amender,
    DeterministicIds,
    find_title,
    html_to_tree,
    parse_and_amend,
    tree_text,
    tree_to_html,
)


def types_of(tree):
    out = []

    def rec(n):
        out.append(n["type"])
        for c in n.get("content") or []:
            rec(c)

    rec(tree)
    return out


def test_basic_blocks():
    tree = html_to_tree("<h2>Head</h2><p>Body <strong>bold</strong> tail</p>")
    assert tree["type"] == "doc"
    h, p = tree["content"]
    assert h["type"] == "heading" and h["attrs"]["level"] == 2
    assert p["type"] == "paragraph"
    assert p["content"][1]["marks"] == [{"type": "bold"}]


def test_inline_at_top_level_wrapped_in_paragraph():
    tree = html_to_tree("stray text <em>emph</em><p>real</p>")
    assert [n["type"] for n in tree["content"]] == ["paragraph", "paragraph"]


def test_dl_dt_dd_become_paragraphs():
    # Mirrors the reference fixture where <dt>/<dd> text renders as <p>.
    tree = html_to_tree("<dl><dt>Stream:</dt><dd>IETF</dd></dl>")
    assert [n["type"] for n in tree["content"]] == ["paragraph", "paragraph"]
    assert tree_text(tree) == "Stream: IETF"


def test_table_cells():
    tree = html_to_tree(
        '<table><tr><th>H</th><td colspan="2">C</td></tr></table>'
    )
    table = tree["content"][0]
    row = table["content"][0]
    th, td = row["content"]
    assert th["type"] == "tableHeader"
    assert td["type"] == "tableCell" and td["attrs"]["colspan"] == 2
    assert td["content"][0]["type"] == "paragraph"


def test_lists():
    tree = html_to_tree('<ol start="3"><li>a</li><li>b</li></ol><ul><li>c</li></ul>')
    ol, ul = tree["content"]
    assert ol["type"] == "orderedList" and ol["attrs"]["start"] == 3
    assert [li["type"] for li in ol["content"]] == ["listItem", "listItem"]
    assert ul["type"] == "bulletList"


def test_codeblock_preserves_whitespace():
    tree = html_to_tree("<pre>line1\n  line2</pre>")
    cb = tree["content"][0]
    assert cb["type"] == "codeBlock"
    assert cb["content"][0]["text"] == "line1\n  line2"


def test_whitespace_collapse_in_paragraph():
    tree = html_to_tree("<p>  a \n\n  b   c </p>")
    assert tree["content"][0]["content"][0]["text"] == "a b c"


def test_link_mark_attrs_captured():
    tree = html_to_tree('<p><a href="https://x.com/" class="c">t</a></p>')
    marks = tree["content"][0]["content"][0]["marks"]
    assert marks[0]["type"] == "link"
    assert marks[0]["attrs"]["href"] == "https://x.com/"


# --- amender (exact port behaviors, src/tiptap.ts:135-187) -----------------


def test_amender_drops_image_without_src():
    tree = {"type": "doc", "content": [{"type": "image", "attrs": {"src": ""}},
                                        {"type": "paragraph", "content": [{"type": "text", "text": "x"}]}]}
    out = Amender(DeterministicIds("s")).amend_node(tree)
    assert [n["type"] for n in out["content"]] == ["paragraph"]


def test_amender_drops_empty_paragraph_and_lone_hardbreak():
    tree = {
        "type": "doc",
        "content": [
            {"type": "paragraph", "content": []},
            {"type": "paragraph", "content": [{"type": "hardBreak"}]},
            {"type": "paragraph", "content": [{"type": "text", "text": "keep"}]},
        ],
    }
    out = Amender(DeterministicIds("s")).amend_node(tree)
    assert len(out["content"]) == 1
    assert out["content"][0]["content"][0]["text"] == "keep"


def test_amender_assigns_unique_ids():
    tree = html_to_tree("<p>a</p><p>b</p><h1>t</h1>")
    out = Amender(DeterministicIds("seed")).amend_node(tree)
    ids = [n["attrs"]["id"] for n in out["content"]]
    assert all(isinstance(i, str) and len(i) == 6 for i in ids)
    assert len(set(ids)) == 3


def test_amender_dedupes_colliding_ids():
    tree = {
        "type": "doc",
        "content": [
            {"type": "paragraph", "attrs": {"id": "dup"}, "content": [{"type": "text", "text": "a"}]},
            {"type": "paragraph", "attrs": {"id": "dup"}, "content": [{"type": "text", "text": "b"}]},
        ],
    }
    out = Amender(DeterministicIds("s")).amend_node(tree)
    ids = [n["attrs"]["id"] for n in out["content"]]
    assert ids[0] == "dup" and ids[1] != "dup"


def test_amender_rewrites_link_marks():
    tree = {
        "type": "doc",
        "content": [
            {
                "type": "paragraph",
                "content": [
                    {
                        "type": "text",
                        "text": "t",
                        "marks": [{"type": "link", "attrs": {"href": "https://x", "class": "z"}}],
                    }
                ],
            }
        ],
    }
    out = Amender(DeterministicIds("s")).amend_node(tree)
    attrs = out["content"][0]["content"][0]["marks"][0]["attrs"]
    assert "class" not in attrs
    assert attrs["rel"] == "noopener noreferrer" and attrs["target"] == "_blank"


def test_deterministic_ids_stable_across_runs():
    a = parse_and_amend("<p>a</p><p>b</p>", seed="https://u")
    b = parse_and_amend("<p>a</p><p>b</p>", seed="https://u")
    assert a == b
    c = parse_and_amend("<p>a</p><p>b</p>", seed="https://other")
    assert c != a  # ids differ by seed


# --- serializer -------------------------------------------------------------


def test_roundtrip_html():
    src = '<h1>T</h1><p>Hello <strong>W</strong> <a href="https://l/">x</a></p>'
    tree = parse_and_amend(src, seed="s")
    html = tree_to_html(tree)
    assert html.startswith("<h1 data-id=")
    assert '<a target="_blank" rel="noopener noreferrer" href="https://l/">x</a>' in html
    # re-parse the clean HTML: text content is preserved
    assert tree_text(parse_and_amend(html, seed="s")) == tree_text(tree)


def test_table_serialization_has_tbody_and_no_cell_ids():
    tree = parse_and_amend("<table><tr><td>v</td></tr></table>", seed="s")
    html = tree_to_html(tree)
    assert "<tbody>" in html
    assert '<td colspan="1" rowspan="1"><p data-id="' in html


def test_find_title_levels():
    tree = parse_and_amend("<h2>Second</h2><h1>First A</h1>", seed="s")
    assert find_title(tree, 1) == "First A"
    assert find_title(tree, 2) == "Second"
    assert find_title(tree, 3) == ""


def test_find_title_joins_direct_text_children():
    tree = {
        "type": "doc",
        "content": [
            {
                "type": "heading",
                "attrs": {"level": 1},
                "content": [
                    {"type": "text", "text": "A"},
                    {"type": "hardBreak"},
                    {"type": "text", "text": "B"},
                ],
            }
        ],
    }
    assert find_title(tree, 1) == "A B"


# --- CBOR -------------------------------------------------------------------


def test_cbor_roundtrip_tree():
    tree = parse_and_amend("<h1>T</h1><p>body <em>i</em></p>", seed="s")
    blob = dumps(tree)
    assert isinstance(blob, bytes) and loads(blob) == tree


def test_cbor_known_vectors():
    # RFC 8949 appendix A vectors
    assert dumps(0) == bytes.fromhex("00")
    assert dumps(23) == bytes.fromhex("17")
    assert dumps(24) == bytes.fromhex("1818")
    assert dumps(-1) == bytes.fromhex("20")
    assert dumps("a") == bytes.fromhex("6161")
    assert dumps([1, [2, 3]]) == bytes.fromhex("8201820203")
    assert dumps({"a": 1}) == bytes.fromhex("a1616101")
    assert dumps(1.1) == bytes.fromhex("fb3ff199999999999a")
    assert dumps(True) == b"\xf5" and dumps(None) == b"\xf6"


def test_cbor_encoding_deterministic_insertion_order():
    assert dumps({"b": 1, "a": 2}) != dumps({"a": 2, "b": 1})
    assert dumps({"b": 1, "a": 2}) == dumps({"b": 1, "a": 2})


def test_tree_json_cbor_equiv():
    tree = parse_and_amend("<p>hello</p>", seed="x")
    assert json.loads(json.dumps(tree)) == loads(dumps(tree))


def _strip_ids(node):
    """Id-insensitive structural view: drop attrs['id'] recursively."""
    out = {k: v for k, v in node.items() if k != "attrs"}
    attrs = {k: v for k, v in (node.get("attrs") or {}).items() if k != "id"}
    if attrs or node.get("attrs") is not None:
        out["attrs"] = attrs
    if node.get("content") is not None:
        out["content"] = [_strip_ids(c) for c in node["content"]]
    return out


def test_task_list_roundtrip():
    src = (
        '<ul data-type="taskList">'
        '<li data-type="taskItem" data-checked="true">done thing</li>'
        '<li data-type="taskItem" data-checked="false">todo thing</li>'
        "</ul>"
    )
    tree = parse_and_amend(src, seed="s")
    assert types_of(tree)[:3] == ["doc", "taskList", "taskItem"]
    items = tree["content"][0]["content"]
    assert [i["attrs"]["checked"] for i in items] == [True, False]
    html = tree_to_html(tree)
    assert 'data-checked="true"' in html and 'checked="checked"' in html
    # id-insensitive structural round-trip through our own serializer
    again = parse_and_amend(html, seed="other")
    assert _strip_ids(again) == _strip_ids(tree)
    assert tree_text(again) == "done thing todo thing"


def test_details_roundtrip():
    src = (
        "<details open><summary>More <b>info</b></summary>"
        "<p>hidden body</p></details>"
    )
    tree = parse_and_amend(src, seed="s")
    det = tree["content"][0]
    assert det["type"] == "details" and det["attrs"]["open"] is True
    assert [c["type"] for c in det["content"]] == [
        "detailsSummary",
        "detailsContent",
    ]
    html = tree_to_html(tree)
    assert html.startswith("<details open><summary data-id=")
    assert '<div data-type="detailsContent"' in html
    again = parse_and_amend(html, seed="other")
    assert _strip_ids(again) == _strip_ids(tree)
    assert tree_text(again) == "More info hidden body"
    # closed details round-trips the flag
    closed = parse_and_amend(src.replace("<details open", "<details"), seed="s")
    assert closed["content"][0]["attrs"]["open"] is False


def test_emoji_and_mention_inline_roundtrip():
    src = (
        '<p>hi <span data-type="emoji" data-name="smile"></span> and '
        '<span data-type="mention" data-id="u1" data-label="ann"></span>!</p>'
    )
    tree = parse_and_amend(src, seed="s")
    para = tree["content"][0]["content"]
    kinds = [n["type"] for n in para]
    assert kinds == ["text", "emoji", "text", "mention", "text"]
    assert para[1]["attrs"] == {"name": "smile"}
    assert para[3]["attrs"] == {"id": "u1", "label": "ann"}
    again = parse_and_amend(tree_to_html(tree), seed="other")
    assert _strip_ids(again) == _strip_ids(tree)


def test_youtube_embed_roundtrip():
    src = (
        '<div data-youtube-video><iframe src="https://www.youtube.com/embed/x1">'
        "</iframe></div>"
    )
    tree = parse_and_amend(src, seed="s")
    assert tree["content"][0] == {
        "type": "youtube",
        "attrs": {"src": "https://www.youtube.com/embed/x1"},
    }
    again = parse_and_amend(tree_to_html(tree), seed="other")
    assert _strip_ids(again) == _strip_ids(tree)


def test_math_stays_text():
    """The reference's Mathematics extension is a katex decoration over
    text — $latex$ must survive as a plain text node, not a node type."""
    tree = parse_and_amend("<p>Euler: $e^{i\\pi}+1=0$</p>", seed="s")
    assert types_of(tree) == ["doc", "paragraph", "text"]
    assert tree_text(tree) == "Euler: $e^{i\\pi}+1=0$"


def test_text_align_roundtrip():
    """TextAlign attr (src/tiptap.ts:81-89): style parsed on blocks,
    re-rendered only when non-default, dropped for the default 'left'."""
    src = (
        '<h2 style="text-align: center">Centered</h2>'
        '<p style="text-align:right">Right</p>'
        '<p style="text-align: left">Default</p>'
        '<blockquote style="text-align: justify"><p>Quote</p></blockquote>'
        '<table style="text-align: center"><tr>'
        '<th style="text-align: right">h</th>'
        '<td style="text-align: center">cell</td></tr></table>'
    )
    tree = parse_and_amend(src, seed="s")
    h2, p_right, p_left, bq, table = tree["content"]
    assert h2["attrs"]["textAlign"] == "center"
    assert p_right["attrs"]["textAlign"] == "right"
    assert "textAlign" not in p_left["attrs"]  # default omitted
    assert bq["attrs"]["textAlign"] == "justify"
    assert table["attrs"]["textAlign"] == "center"  # 'table' is in the list
    th, cell = table["content"][0]["content"]
    assert "textAlign" not in th["attrs"]  # tableHeader is NOT in the list
    assert cell["attrs"]["textAlign"] == "center"
    html = tree_to_html(tree)
    assert 'style="text-align: center"' in html
    assert 'style="text-align: right"' in html
    assert html.count("text-align") == 5  # h2, p, blockquote, table, td
    again = parse_and_amend(html, seed="other")
    assert _strip_ids(again) == _strip_ids(tree)


def test_text_align_justify_on_blockquote_rendered():
    tree = parse_and_amend(
        '<blockquote style="text-align: justify"><p>q</p></blockquote>', seed="s"
    )
    html = tree_to_html(tree)
    assert html.startswith("<blockquote data-id=")
    assert 'style="text-align: justify"' in html


def test_text_style_color_mark_roundtrip():
    """Color extension over TextStyle: span[style*=color] becomes a
    textStyle mark; nested colored spans override (innermost wins)."""
    src = (
        '<p>plain <span style="color: #958DF1">violet '
        '<span style="color:red">red</span></span> tail</p>'
    )
    tree = parse_and_amend(src, seed="s")
    inline = tree["content"][0]["content"]
    assert [n.get("marks") for n in inline] == [
        None,
        [{"type": "textStyle", "attrs": {"color": "#958DF1"}}],
        [{"type": "textStyle", "attrs": {"color": "red"}}],
        None,
    ]
    html = tree_to_html(tree)
    assert '<span style="color: #958DF1">violet</span>' in html
    assert '<span style="color: red">red</span>' in html
    again = parse_and_amend(html, seed="other")
    assert _strip_ids(again) == _strip_ids(tree)


def test_text_style_composes_with_other_marks():
    src = '<p><b><span style="color: blue">bold blue</span></b></p>'
    tree = parse_and_amend(src, seed="s")
    node = tree["content"][0]["content"][0]
    assert {m["type"] for m in node["marks"]} == {"bold", "textStyle"}
    again = parse_and_amend(tree_to_html(tree), seed="other")
    assert _strip_ids(again) == _strip_ids(tree)
