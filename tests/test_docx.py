"""U3 DOCX reader unit tests: headings/lists/runs plus the mammoth-parity
additions — hyperlinks through the rels part and pipe tables — in the same
markdown dialect as the HTML path (tables: header + `| --- |`, `\\|`
escaping; links: `[text](url)`)."""

from __future__ import annotations

import io
import zipfile

from document_converter_api_spark.extraction.docx import docx_to_markdown

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _docx(body_xml: str, rels_xml: str | None = None,
          numbering_xml: str | None = None) -> bytes:
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{_W}" xmlns:r="{_R}">'
           f"<w:body>{body_xml}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
        if rels_xml is not None:
            zf.writestr("word/_rels/document.xml.rels", rels_xml)
        if numbering_xml is not None:
            zf.writestr("word/numbering.xml", numbering_xml)
    return buf.getvalue()


def _numbering(fmt_by_lvl: dict[int, str], num_id: str = "1") -> str:
    lvls = "".join(
        f'<w:lvl w:ilvl="{i}"><w:numFmt w:val="{f}"/></w:lvl>'
        for i, f in fmt_by_lvl.items())
    return (f'<w:numbering xmlns:w="{_W}">'
            f'<w:abstractNum w:abstractNumId="0">{lvls}</w:abstractNum>'
            f'<w:num w:numId="{num_id}"><w:abstractNumId w:val="0"/></w:num>'
            f"</w:numbering>")


def _li(text: str, num_id: str = "1", ilvl: int = 0) -> str:
    return (f'<w:p><w:pPr><w:numPr><w:ilvl w:val="{ilvl}"/>'
            f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>{_r(text)}</w:p>')


def _r(text: str, pr: str = "") -> str:
    return f"<w:r>{pr}<w:t>{text}</w:t></w:r>"


def test_heading_list_and_emphasis():
    body = (f'<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>{_r("Title")}</w:p>'
            f'<w:p>{_r("plain ")}{_r("bold", "<w:rPr><w:b/></w:rPr>")}</w:p>'
            f'<w:p><w:pPr><w:pStyle w:val="ListParagraph"/></w:pPr>{_r("item")}</w:p>')
    md = docx_to_markdown(_docx(body))
    assert md == "## Title\n\nplain **bold**\n\n- item"


def test_hyperlink_resolved_through_rels():
    body = (f'<w:p>{_r("see ")}'
            f'<w:hyperlink r:id="rId7">{_r("the docs")}</w:hyperlink></w:p>')
    rels = (f'<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">'
            f'<Relationship Id="rId7" Type="x" Target="https://d.example/p"/>'
            f"</Relationships>")
    md = docx_to_markdown(_docx(body, rels))
    assert md == "see [the docs](https://d.example/p)"


def test_hyperlink_without_rels_degrades_to_text():
    body = f'<w:p><w:hyperlink r:id="rId9">{_r("orphan")}</w:hyperlink></w:p>'
    assert docx_to_markdown(_docx(body)) == "orphan"


def test_table_pipe_dialect_and_cell_escaping():
    body = ("<w:tbl>"
            f"<w:tr><w:tc><w:p>{_r('K')}</w:p></w:tc>"
            f"<w:tc><w:p>{_r('V')}</w:p></w:tc></w:tr>"
            f"<w:tr><w:tc><w:p>{_r('a|b')}</w:p></w:tc>"
            f"<w:tc><w:p>{_r('2')}</w:p></w:tc></w:tr>"
            "</w:tbl>")
    md = docx_to_markdown(_docx(body))
    assert md == "| K | V |\n| --- | --- |\n| a\\|b | 2 |"


def test_numbered_list_with_nested_levels():
    """numPr-driven lists: decimal markers count per level, nesting indents
    two spaces per ilvl (the HTML _serialize_list dialect), and a deeper
    level's counter resets when the shallower level advances."""
    numbering = _numbering({0: "decimal", 1: "decimal"})
    body = (_li("one") + _li("one-a", ilvl=1) + _li("one-b", ilvl=1)
            + _li("two") + _li("two-a", ilvl=1))
    md = docx_to_markdown(_docx(body, numbering_xml=numbering))
    assert md == ("1. one\n"
                  "  1. one-a\n"
                  "  2. one-b\n"
                  "2. two\n"
                  "  1. two-a")


def test_numbering_continues_across_interleaved_paragraph():
    numbering = _numbering({0: "decimal"})
    body = (_li("first") + f"<w:p>{_r('interlude')}</w:p>" + _li("second"))
    md = docx_to_markdown(_docx(body, numbering_xml=numbering))
    assert md == "1. first\n\ninterlude\n\n2. second"


def test_bullet_numfmt_and_missing_numbering_part():
    numbering = _numbering({0: "bullet"})
    md = docx_to_markdown(_docx(_li("dot"), numbering_xml=numbering))
    assert md == "- dot"
    # no numbering.xml at all → bullets, never a crash
    md2 = docx_to_markdown(_docx(_li("a") + _li("b", ilvl=1)))
    assert md2 == "- a\n  - b"


def test_independent_num_ids_count_separately():
    numbering = (f'<w:numbering xmlns:w="{_W}">'
                 f'<w:abstractNum w:abstractNumId="0">'
                 f'<w:lvl w:ilvl="0"><w:numFmt w:val="decimal"/></w:lvl>'
                 f"</w:abstractNum>"
                 f'<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
                 f'<w:num w:numId="2"><w:abstractNumId w:val="0"/></w:num>'
                 f"</w:numbering>")
    body = (_li("a1", num_id="1") + _li("b1", num_id="2")
            + _li("a2", num_id="1"))
    md = docx_to_markdown(_docx(body, numbering_xml=numbering))
    assert md == "1. a1\n1. b1\n2. a2"


def test_anchor_hyperlink_renders_internal_link():
    body = (f'<w:p>{_r("go to ")}'
            f'<w:hyperlink w:anchor="sec2">{_r("section 2")}</w:hyperlink>'
            f"</w:p>")
    assert docx_to_markdown(_docx(body)) == "go to [section 2](#sec2)"


def test_table_cell_paragraphs_not_duplicated_as_body_paragraphs():
    body = (f"<w:p>{_r('before')}</w:p>"
            "<w:tbl>"
            f"<w:tr><w:tc><w:p>{_r('cell')}</w:p></w:tc></w:tr>"
            "</w:tbl>"
            f"<w:p>{_r('after')}</w:p>")
    md = docx_to_markdown(_docx(body))
    assert md.count("cell") == 1
    assert md.startswith("before") and md.endswith("after")
