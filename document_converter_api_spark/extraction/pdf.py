"""Minimal PDF text extraction (U2, SURVEY.md §2.9).

MarkItDown 0.1.0's PDF path is pdfminer.six ``extract_text`` — layout-ordered
plain text with form-feed page separators (the operator the reference invokes
at /root/reference/app/main.py:383-391 for ``.pdf`` uploads, whitelist at
:204). pdfminer is not installable in this sandbox (no network), so this is a
stdlib-only content-stream tokenizer covering the deterministic synthetic-PDF
subset the fixtures generate (FIXTURES.md §3): ``%PDF-1.x``, text drawn with
``BT/ET``, ``Tf``, ``Td/TD/T*``, ``Tj``/``TJ``/``'``, literal ``(...)`` and
hex ``<...>`` strings, plain and FlateDecode streams, one content stream per
page.

Semantics (pdfminer-style):
* each ``Td``/``TD``/``T*``/``'`` newline-advance emits ``\\n``;
* strings within one line concatenate;
* pages join with ``\\f``; output ends with a trailing ``\\f`` then ``\\n``
  is NOT appended (we emit exactly page texts joined by ``\\f``).

Pure Python; no Spark imports.
"""

from __future__ import annotations

import re
import zlib

_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")

# Per-stream inflate cap: page content streams are normally well under a
# few MB; anything larger is a decompression bomb for this pipeline.
MAX_STREAM_BYTES = 64 * 1024 * 1024


def _iter_streams(data: bytes):
    """Yield (dict_params, stream_body) for each content stream.

    Uses the literal ``/Length`` when present so binary (Flate) bodies that
    happen to contain ``endstream`` bytes are handled correctly; indirect
    /Length references (not emitted by our fixture subset) fall back to the
    next ``endstream`` keyword.
    """
    pos = 0
    n = len(data)
    while pos < n:
        si = data.find(b"stream", pos)
        if si < 0:
            return
        if data[max(0, si - 3):si] == b"end":  # matched inside "endstream"
            pos = si + 6
            continue
        after = si + 6
        if data[after:after + 2] == b"\r\n":
            body_start = after + 2
        elif data[after:after + 1] == b"\n":
            body_start = after + 1
        else:
            pos = after
            continue
        oi = data.rfind(b"obj", 0, si)
        params = data[oi:si] if oi >= 0 else data[max(0, si - 512):si]
        m = _LENGTH_RE.search(params)
        if m:
            length = int(m.group(1))
            body = data[body_start:body_start + length]
            end = data.find(b"endstream", body_start + length)
            pos = end + 9 if end >= 0 else body_start + length
        else:
            end = data.find(b"endstream", body_start)
            if end < 0:
                return
            body = data[body_start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n"):
                body = body[:-1]
            pos = end + 9
        yield params, body


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0x5C:  # backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in b"nrtbf":
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[c])
            i += 1
        elif c in b"()\\":
            out.append(c)
            i += 1
        elif 0x30 <= c <= 0x37:  # octal escape, up to 3 digits
            j = i
            while j < n and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c == 0x0A:  # line continuation
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _iter_strings_and_ops(stream: bytes):
    """Yield ('str', bytes) for string objects and ('op', name) for operators
    relevant to text layout, in stream order."""
    i = 0
    n = len(stream)
    while i < n:
        b = stream[i]
        if b == 0x28:  # '(' literal string, balanced parens with escapes
            depth = 1
            j = i + 1
            start = j
            while j < n and depth:
                c = stream[j]
                if c == 0x5C:
                    j += 2
                    continue
                if c == 0x28:
                    depth += 1
                elif c == 0x29:
                    depth -= 1
                j += 1
            yield ("str", _unescape_literal(stream[start:j - 1]))
            i = j
        elif b == 0x3C and i + 1 < n and stream[i + 1] != 0x3C:  # '<' hex string
            j = stream.find(b">", i + 1)
            if j < 0:
                break
            hexdigits = re.sub(rb"\s+", b"", stream[i + 1:j])
            if len(hexdigits) % 2:
                hexdigits += b"0"
            try:
                yield ("str", bytes.fromhex(hexdigits.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif b == 0x25:  # comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif (0x41 <= b <= 0x5A) or (0x61 <= b <= 0x7A) or b == 0x27 or b == 0x22:
            j = i
            while j < n and (
                (0x41 <= stream[j] <= 0x5A) or (0x61 <= stream[j] <= 0x7A)
                or stream[j] in (0x27, 0x22, 0x2A)
            ):
                j += 1
            yield ("op", stream[i:j].decode("latin-1"))
            i = j
        else:
            i += 1


def _stream_to_text(stream: bytes) -> str:
    """Decode one page content stream to text lines."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[bytes] = []  # strings seen since last op
    in_text = False

    def newline() -> None:
        nonlocal cur
        if cur:
            lines.append("".join(cur))
            cur = []
        elif lines or in_text:
            lines.append("")

    first_line = True
    for kind, val in _iter_strings_and_ops(stream):
        if kind == "str":
            pending.append(val)
            continue
        op = val
        if op == "BT":
            in_text = True
            first_line = True
            pending.clear()
        elif op == "ET":
            if cur:
                lines.append("".join(cur))
                cur = []
            in_text = False
            pending.clear()
        elif op in ("Td", "TD", "T*"):
            if not first_line:
                newline()
            first_line = False
            pending.clear()
        elif op == "Tj":
            if pending:
                cur.append(pending[-1].decode("latin-1"))
            pending.clear()
        elif op == "TJ":
            cur.append(b"".join(pending).decode("latin-1"))
            pending.clear()
        elif op == "'":
            newline()
            first_line = False
            if pending:
                cur.append(pending[-1].decode("latin-1"))
            pending.clear()
        else:
            pending.clear()
    if cur:
        lines.append("".join(cur))
    return "\n".join(lines)


def pdf_to_text(data: bytes) -> str:
    """Extract layout text from a fixture-subset PDF; pages joined by \\f."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    pages: list[str] = []
    for params, body in _iter_streams(data):
        if b"/FlateDecode" in params:
            try:
                # bounded inflate: a crafted stream can expand 1000:1, and an
                # unbounded decompress of a 50 MB payload could OOM the
                # Python worker — skip bomb streams like corrupt ones
                d = zlib.decompressobj()
                body = d.decompress(body, MAX_STREAM_BYTES)
                if d.unconsumed_tail or not d.eof:
                    # bomb (output cap hit) OR truncated stream — plain
                    # zlib.decompress raised on truncation and the old code
                    # skipped; keep skipping rather than emitting partial
                    # garbage text
                    continue
            except zlib.error:
                continue
        if b"/Image" in params or b"/XObject" in params:
            continue
        text = _stream_to_text(body)
        pages.append(text)
    if not pages:
        return ""
    # pdfminer.six extract_text style: every page ends with "\n\f".
    return "".join(p + "\n\f" for p in pages)
