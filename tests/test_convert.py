"""C1-C5 converters (reference src/converting.ts)."""

import pytest

from webscraper_ray.oracle.convert import (
    HeadingLevel,
    convert_markdown,
    convert_pdf,
    convert_pdf_items,
    convert_text,
    get_converter,
)
from webscraper_ray.oracle.tree import find_title, tree_text


def test_registry_dispatch():
    assert get_converter("text/html").__name__ == "convert_html"
    assert get_converter("text/markdown").__name__ == "convert_markdown"
    assert get_converter("text/x-markdown").__name__ == "convert_markdown"
    assert get_converter("application/pdf").__name__ == "convert_pdf"
    assert get_converter("application/x-pdf").__name__ == "convert_pdf"
    assert get_converter("text/plain").__name__ == "convert_text"
    with pytest.raises(ValueError, match="not implemented"):
        get_converter("image/png")


def test_convert_html_chain():
    tree = get_converter("text/html")(b"<h1>Title</h1><p>body</p>")
    assert find_title(tree, 1) == "Title"
    assert tree["content"][0]["attrs"]["id"]  # amended


def test_convert_text_lines():
    tree = convert_text(b"line one\r\n\r\n  line two  \rline three\n\n")
    assert [n["type"] for n in tree["content"]] == ["paragraph"] * 3
    assert tree_text(tree) == "line one line two line three"


def test_convert_text_empty():
    assert convert_text(b"  \n \r\n ")["content"] == []


def test_convert_markdown_subset():
    md = (
        b"# Top\n\nIntro paragraph with **bold** and a [link](https://x.com/).\n\n"
        b"- item a\n- item b\n\n1. first\n2. second\n\n"
        b"```\ncode here\n```\n\n> quoted line\n\n---\n"
    )
    tree = convert_markdown(md)
    kinds = [n["type"] for n in tree["content"]]
    assert kinds == [
        "heading", "paragraph", "bulletList", "orderedList",
        "codeBlock", "blockquote", "horizontalRule",
    ]
    assert find_title(tree, 1) == "Top"
    para = tree["content"][1]["content"]
    assert any(n.get("marks") == [{"type": "bold"}] for n in para)
    link = [n for n in para if n.get("marks") and n["marks"][0]["type"] == "link"]
    assert link and link[0]["marks"][0]["attrs"]["href"] == "https://x.com/"
    assert link[0]["marks"][0]["attrs"]["rel"] == "noopener noreferrer"


def test_pdf_malformed_rejected():
    # C4 byte decode is real now (oracle/pdf.py); malformed input lands in
    # the converter error channel as ValueError, the HTTP 400 analog
    with pytest.raises(ValueError):
        convert_pdf(b"%PDF-1.4 ...")


# --- HeadingLevel histogram (src/converting.ts:172-217) ---------------------


def test_heading_level_histogram():
    hl = HeadingLevel()
    for _ in range(10):
        hl.add(10.0)   # body (mode)
    for _ in range(3):
        hl.add(14.0)   # larger -> heading
    for _ in range(2):
        hl.add(18.0)   # largest -> level 1
    hl.add(8.0)        # smaller than body -> not a heading
    hl.finalize()
    assert hl.level(18.0) == 1
    assert hl.level(14.0) == 2
    assert hl.level(10.0) == 0
    assert hl.level(8.0) == 0
    assert hl.level(16.0) == 2  # >=14 but <18


def test_heading_level_caps_at_six():
    hl = HeadingLevel()
    for _ in range(50):
        hl.add(10.0)
    for h in (11, 12, 13, 14, 15, 16, 17, 18):
        hl.add(float(h))
    hl.finalize()
    assert len(hl.levels) == 6
    # six smallest larger-than-body heights kept, largest of those = level 1
    assert hl.level(16.0) == 1
    assert hl.level(18.0) == 1  # above every kept level
    assert hl.level(11.0) == 6


def test_heading_level_empty():
    hl = HeadingLevel()
    hl.finalize()
    assert hl.level(12.0) == 0


def test_convert_pdf_items_full_heuristic():
    def item(s, h, eol=False, d="ltr"):
        return {"str": s, "height": h, "hasEOL": eol, "dir": d}

    page = [
        item("Big Title", 18.0, eol=True),
        item("Intro ", 10.0), item("text.", 10.0, eol=True),
        item("Sub", 14.0, eol=True),
        item("Sub continued", 14.0, eol=True),  # same-level headings merge
        item("Body again.", 10.0, eol=True),
    ] + [item("pad", 10.0, eol=True) for _ in range(6)] + [
        item("vertical\ntext", 10.0, d="ttb"),  # ttb: \n -> ' ', no EOL -> leftover
    ]
    tree = convert_pdf_items([page])
    kinds = [(n["type"], (n.get("attrs") or {}).get("level")) for n in tree["content"]]
    assert kinds[0] == ("heading", 1)
    assert kinds[1] == ("paragraph", None)
    assert kinds[2] == ("heading", 2)
    heading2 = tree["content"][2]
    assert [t["text"] for t in heading2["content"]] == ["Sub", "Sub continued"]
    # leftover non-EOL text becomes a trailing paragraph, \n converted
    assert tree["content"][-1]["content"][0]["text"] == "vertical text"


def test_convert_pdf_items_deterministic():
    page = [{"str": "a", "height": 10.0, "hasEOL": True, "dir": "ltr"}]
    assert convert_pdf_items([page], seed="s") == convert_pdf_items([page], seed="s")


def test_convert_markdown_gfm_extensions():
    """Round-3 C3 breadth: setext headings, images, underscore emphasis,
    strikethrough, hard breaks, fenced-language, GFM tables + task lists
    (the shapes marked.parse handles with GFM defaults)."""
    md = (
        b"Setext Title\n====\n\nSub\n---\n\n"
        b"line one  \nline two with __strong__ and _em_ and ~~gone~~.\n\n"
        b"![logo](https://x.com/l.png)\n\n"
        b"| name | n |\n|---|---|\n| a | 1 |\n| b | 2 |\n\n"
        b"- [x] done\n- [ ] todo\n\n"
        b"```python\nprint('hi')\n```\n"
    )
    tree = convert_markdown(md)
    kinds = [n["type"] for n in tree["content"]]
    assert kinds == [
        "heading", "heading", "paragraph", "image", "table",
        "taskList", "codeBlock",
    ]
    h1, h2 = tree["content"][0], tree["content"][1]
    assert (h1["attrs"]["level"], h2["attrs"]["level"]) == (1, 2)
    assert find_title(tree, 1) == "Setext Title"
    para = tree["content"][2]["content"]
    assert any(n["type"] == "hardBreak" for n in para)
    marks = [n["marks"][0]["type"] for n in para if n.get("marks")]
    assert marks == ["bold", "italic", "strike"]
    assert tree["content"][3]["attrs"]["src"] == "https://x.com/l.png"
    table = tree["content"][4]
    first_row = table["content"][0]["content"]
    assert [c["type"] for c in first_row] == ["tableHeader", "tableHeader"]
    assert tree_text(table) == "name n a 1 b 2"
    tasks = tree["content"][5]["content"]
    assert [t["attrs"]["checked"] for t in tasks] == [True, False]
    code = tree["content"][6]
    assert code["attrs"]["language"] == "python"
    assert code["content"][0]["text"] == "print('hi')"


def test_markdown_underscore_in_identifiers_not_emphasis():
    tree = convert_markdown(b"use snake_case_name here\n")
    assert tree_text(tree) == "use snake_case_name here"
    assert not any(
        n.get("marks") for n in tree["content"][0]["content"]
    )


def test_md_no_emphasis_inside_urls_or_code():
    """marked/GFM never emphasizes link destinations or code spans."""
    from webscraper_ray.oracle.convert import _md_inline

    assert (
        _md_inline("[t](/docs/_private_/page)")
        == '<a href="/docs/_private_/page">t</a>'
    )
    assert (
        _md_inline("[api](https://ex.com/my__mod__x)")
        == '<a href="https://ex.com/my__mod__x">api</a>'
    )
    assert _md_inline("`a_b_c` and `x**y**z`") == "<code>a_b_c</code> and <code>x**y**z</code>"
    assert (
        _md_inline("![alt_text](/img/_raw_.png)")
        == '<img src="/img/_raw_.png" alt="alt_text">'
    )
    # emphasis still applies to link TEXT and surrounding prose
    assert (
        _md_inline("go [**bold** link](/u_v_w) _now_")
        == 'go <a href="/u_v_w"><strong>bold</strong> link</a> <em>now</em>'
    )
