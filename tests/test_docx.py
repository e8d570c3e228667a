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


def _docx(body_xml: str, rels_xml: str | None = None) -> bytes:
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{_W}" xmlns:r="{_R}">'
           f"<w:body>{body_xml}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
        if rels_xml is not None:
            zf.writestr("word/_rels/document.xml.rels", rels_xml)
    return buf.getvalue()


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


def test_table_cell_paragraphs_not_duplicated_as_body_paragraphs():
    body = (f"<w:p>{_r('before')}</w:p>"
            "<w:tbl>"
            f"<w:tr><w:tc><w:p>{_r('cell')}</w:p></w:tc></w:tr>"
            "</w:tbl>"
            f"<w:p>{_r('after')}</w:p>")
    md = docx_to_markdown(_docx(body))
    assert md.count("cell") == 1
    assert md.startswith("before") and md.endswith("after")
