"""Minimal DOCX → markdown (U3, SURVEY.md §2.9).

MarkItDown 0.1.0 converts DOCX via mammoth→HTML→markdownify (the ``.docx``
half of the reference's whitelist, /root/reference/app/main.py:204). mammoth
is not installable here, so this is a stdlib ``zipfile`` + ``xml.etree``
reader for the OOXML subset our fixtures emit: paragraphs with Heading1-6 /
ListParagraph styles, bold/italic runs, hyperlinks (resolved through
``word/_rels/document.xml.rels``), and tables serialized as pipe tables.
Output uses the same markdown dialect as the HTML path (``markdown.py``:
``**``/``*`` emphasis, ``[text](url)`` links, ``| --- |`` tables with
``\\|`` cell escaping) so downstream post-format (F2/F3) is format-agnostic.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_RELS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_HEADING_RE = re.compile(r"^[Hh]eading\s*([1-6])$")


def _load_rels(zf: zipfile.ZipFile) -> dict[str, str]:
    """rId → target url from word/_rels/document.xml.rels (absent in
    link-free documents)."""
    try:
        info = zf.getinfo("word/_rels/document.xml.rels")
    except KeyError:
        return {}
    if info.file_size > MAX_MEMBER_BYTES:
        return {}  # rels bomb: extract without link targets rather than OOM
    data = zf.read(info)
    rels = {}
    for rel in ET.fromstring(data).findall(f"{_RELS}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target")
        if rid and target:
            rels[rid] = target
    return rels


def _run_md(run: ET.Element) -> str:
    rpr = run.find(f"{_W}rPr")
    bold = rpr is not None and rpr.find(f"{_W}b") is not None
    italic = rpr is not None and rpr.find(f"{_W}i") is not None
    text = "".join(t.text or "" for t in run.findall(f"{_W}t"))
    if not text:
        return ""
    if bold:
        text = f"**{text}**"
    if italic:
        text = f"*{text}*"
    return text


def _para_inline(para: ET.Element, rels: dict[str, str]) -> str:
    """Runs + hyperlinks of one paragraph, in document order."""
    parts: list[str] = []
    for child in para:
        if child.tag == f"{_W}r":
            parts.append(_run_md(child))
        elif child.tag == f"{_W}hyperlink":
            inner = "".join(_run_md(r) for r in child.findall(f"{_W}r"))
            href = rels.get(child.get(f"{_R}id", ""), "")
            if inner:
                parts.append(f"[{inner}]({href})" if href else inner)
    return "".join(parts).strip()


def _para_block(para: ET.Element, rels: dict[str, str]) -> str | None:
    ppr = para.find(f"{_W}pPr")
    style = ""
    if ppr is not None:
        st = ppr.find(f"{_W}pStyle")
        if st is not None:
            style = st.get(f"{_W}val", "")
    text = _para_inline(para, rels)
    if not text:
        return None
    m = _HEADING_RE.match(style)
    if m:
        return "#" * int(m.group(1)) + " " + text
    if style == "ListParagraph":
        return f"- {text}"
    return text


def _table_block(tbl: ET.Element, rels: dict[str, str]) -> str | None:
    """w:tbl → pipe table, same dialect as markdown._serialize_table
    (first row is the header, cells escape '|', width-padded)."""
    rows: list[list[str]] = []
    for tr in tbl.findall(f"{_W}tr"):
        cells = []
        for tc in tr.findall(f"{_W}tc"):
            text = " ".join(
                t for t in (_para_inline(p, rels)
                            for p in tc.findall(f"{_W}p")) if t)
            cells.append(text.replace("\n", " ").replace("|", "\\|"))
        if cells:
            rows.append(cells)
    if not rows:
        return None
    width = max(len(r) for r in rows)
    out = ["| " + " | ".join(rows[0] + [""] * (width - len(rows[0]))) + " |",
           "| " + " | ".join(["---"] * width) + " |"]
    for r in rows[1:]:
        out.append("| " + " | ".join(r + [""] * (width - len(r))) + " |")
    return "\n".join(out)


# Decompressed-member cap: a crafted DOCX can deflate 1000:1; CPython's
# ZipExtFile truncates at the declared file_size, so gating on it bounds
# worker memory (oversize → error row via the extract_document wrapper).
MAX_MEMBER_BYTES = 64 * 1024 * 1024


def docx_to_markdown(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        if zf.getinfo("word/document.xml").file_size > MAX_MEMBER_BYTES:
            raise ValueError("docx member exceeds decompression cap")
        xml_bytes = zf.read("word/document.xml")
        rels = _load_rels(zf)
    root = ET.fromstring(xml_bytes)
    body = root.find(f"{_W}body")
    if body is None:
        return ""
    blocks: list[str] = []
    # walk body children in document order — iter() would flatten table-cell
    # paragraphs out of their tables and emit them twice
    for child in body:
        if child.tag == f"{_W}p":
            block = _para_block(child, rels)
        elif child.tag == f"{_W}tbl":
            block = _table_block(child, rels)
        else:
            block = None
        if block:
            blocks.append(block)
    return "\n\n".join(blocks)
