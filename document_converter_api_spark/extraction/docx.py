"""Minimal DOCX → markdown (U3, SURVEY.md §2.9).

MarkItDown 0.1.0 converts DOCX via mammoth→HTML→markdownify (the ``.docx``
half of the reference's whitelist, /root/reference/app/main.py:204). mammoth
is not installable here, so this is a stdlib ``zipfile`` + ``xml.etree``
reader for the OOXML subset our fixtures emit: paragraphs with Heading1-6 /
ListParagraph styles, bold/italic runs. Output uses the same markdown dialect
as the HTML path so downstream post-format (F2/F3) is format-agnostic.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_HEADING_RE = re.compile(r"^[Hh]eading\s*([1-6])$")


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


def docx_to_markdown(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml_bytes = zf.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    blocks: list[str] = []
    for para in root.iter(f"{_W}p"):
        ppr = para.find(f"{_W}pPr")
        style = ""
        if ppr is not None:
            st = ppr.find(f"{_W}pStyle")
            if st is not None:
                style = st.get(f"{_W}val", "")
        text = "".join(_run_md(r) for r in para.findall(f"{_W}r")).strip()
        if not text:
            continue
        m = _HEADING_RE.match(style)
        if m:
            blocks.append("#" * int(m.group(1)) + " " + text)
        elif style == "ListParagraph":
            blocks.append(f"- {text}")
        else:
            blocks.append(text)
    return "\n\n".join(blocks)
