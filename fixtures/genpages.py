"""Seeded synthetic Common-Crawl-style pages corpus + golden outputs.

Implements FIXTURES.md §1–§3: deterministic (seed=42) generator for the
``pages`` table (url, warc_ts, html BINARY, text, lang) with

* Zipf-like host skew (one hot host dominates — skew-test ground truth),
* labeled-boilerplate HTML (nav/header link farms, main/article content,
  aside/footer/ads) so block classification has an oracle,
* minimal well-formed PDFs (plain + FlateDecode streams, multi-page),
* DOCX (OOXML zip) payloads,
* reject rows (jpg/zip junk — reference whitelist app/main.py:204,224-229)
  and oversize rows (size gate app/main.py:484-488,644-648, scaled),
* pathological HTML (unclosed tags, entities) for parser-tolerance tests.

Goldens are produced by the single-process extraction core
(document_converter_api_spark.extraction.core.extract_document) — SURVEY.md
§5.2.1. Usage::

    python -m fixtures.genpages --scale smoke --outdir fixtures/data

Scales: smoke=500 rows, correctness=5000, bench=50000 (FIXTURES.md §1).
"""

from __future__ import annotations

import argparse
import io
import os
import random
import sys
import zipfile
import zlib
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_converter_api_spark.extraction.core import extract_document  # noqa: E402
from document_converter_api_spark.extraction.pdf_crypt import (  # noqa: E402
    StandardDecryptor,
    compute_key,
    compute_o,
    compute_o_oe_r6,
    compute_perms_r6,
    compute_u,
    compute_u_ue_r6,
)
from document_converter_api_spark.extraction.postformat import (  # noqa: E402
    format_google_docs,
    format_plain_text,
)

SCALES = {"smoke": 500, "correctness": 5000, "bench": 50000}

BASE_TS = datetime(2025, 6, 1, 0, 0, 0)

_WORDS = {
    "en": ("the quick brown fox jumps over lazy dog data pipeline spark "
           "cluster partition shuffle extract markdown content analysis "
           "document corpus language model training quality signal web "
           "crawl archive snapshot index token batch vector stream").split(),
    "es": ("el rapido zorro marron salta sobre perro perezoso datos "
           "canal chispa grupo particion mezcla extraer contenido analisis "
           "documento corpus lengua modelo entrenamiento calidad red "
           "rastreo archivo instantanea indice lote vector flujo").split(),
    "de": ("der schnelle braune fuchs springt uber faulen hund daten "
           "leitung funke gruppe partition mischen extrahieren inhalt "
           "dokument korpus sprache modell training qualitat netz "
           "durchlauf archiv abbild index stapel vektor strom").split(),
}

HOSTS = ["hot.example.com"] + [f"site{i:02d}.example.org" for i in range(1, 20)]
# Zipf-ish: hot host ~40%, rest 1/k decay.
_HOST_WEIGHTS = [40.0] + [6.0 / k for k in range(1, 20)]


def _sentence(rng: random.Random, lang: str, nwords: int) -> str:
    pool = _WORDS[lang]
    ws = [rng.choice(pool) for _ in range(nwords)]
    return (" ".join(ws)).capitalize() + "."


def _paragraph(rng: random.Random, lang: str) -> str:
    return " ".join(_sentence(rng, lang, rng.randint(6, 14))
                    for _ in range(rng.randint(2, 5)))


def _link_farm(rng: random.Random, n: int) -> str:
    return " ".join(
        f'<a href="/cat/{rng.randint(1, 99)}">{rng.choice(_WORDS["en"])}</a>'
        for _ in range(n)
    )


def _head_extras(idx: int, lang: str, host: str, title: str) -> str:
    """Deterministic head-tag extras (canonical / meta-robots /
    OpenGraph / JSON-LD) for the head-tags operator tier
    (``operators/headtags.py``).

    Drawn from a DEDICATED rng seeded by idx so the main content
    stream is untouched — the page body is byte-identical with or
    without this block, which keeps the extraction goldens stable.
    Head content never reaches the extracted text (title/meta/link are
    head metadata; the JSON-LD script body is stripped by the script
    rule), so ``truth`` is unaffected by construction.
    """
    hrng = random.Random(0x4EAD5EED ^ (idx * 2654435761))
    lines = []
    if hrng.random() < 0.70:
        # most modern pages declare their (utf-8) encoding
        lines.append('<meta charset="utf-8">')
    p = hrng.random()
    if p < 0.30:
        # self-canonical: the page IS its canonical form
        lines.append(f'<link rel="canonical" '
                     f'href="https://{host}/{lang}/page-{idx:06d}.html">')
    elif p < 0.50:
        # cluster canonical: idx-bucket siblings on the same host share
        # one target → real canonical dup clusters, biggest on the
        # Zipf-hot host
        lines.append(f'<link rel="canonical" '
                     f'href="https://{host}/canonical/{idx // 8:06d}">')
    q = hrng.random()
    if q < 0.12:
        lines.append('<meta name="robots" content="noindex, follow">')
    elif q < 0.20:
        lines.append('<meta name="robots" content="index, nofollow">')
    elif q < 0.25:
        lines.append('<meta name="robots" content="noindex, nofollow">')
    if hrng.random() < 0.55:
        og_type = "article" if hrng.random() < 0.7 else "website"
        desc = _sentence(hrng, lang, 8).rstrip(".")
        lines.append(f'<meta property="og:title" content="{title}">')
        lines.append(f'<meta property="og:type" content="{og_type}">')
        lines.append(f'<meta property="og:description" content="{desc}">')
    if hrng.random() < 0.30:
        jtype = hrng.choice(["Article", "NewsArticle", "BlogPosting"])
        wc = hrng.randint(100, 2000)
        lines.append(
            '<script type="application/ld+json">'
            f'{{"@context": "https://schema.org", "@type": "{jtype}", '
            f'"headline": "{title}", "wordCount": {wc}}}</script>')
    return "\n".join(lines)


# accent repairs for the legacy-charset branch: words the ASCII pools
# flatten, restored so the payload has genuine non-ASCII bytes (a pure
# ASCII body encodes identically in every charset — the decode path
# would never be exercised)
_ACCENTS = (
    ("uber", "über"), ("qualitat", "qualität"),       # de
    ("rapido", "rápido"), ("particion", "partición"),  # es
    ("analisis", "análisis"), ("indice", "índice"),
    ("quality", "qualité"),                            # en (loanword)
)


def _legacy_encode(payload: bytes, truth: str,
                   idx: int) -> tuple[bytes, str]:
    """Re-encode a built page as a legacy-charset variant: accent
    restoration in body AND truth, then windows-1252 with a declared
    ``<meta charset>`` (70%) or BOM'd UTF-16LE (30%). Decoding these
    correctly is the extraction core's charset tier
    (``extraction/core.decode_payload``)."""
    text = payload.decode("utf-8")
    for a, b in _ACCENTS:
        text = text.replace(a, b)
        truth = truth.replace(a, b)
    crng = random.Random(0xC4A125E7 ^ (idx * 2654435761))
    if crng.random() < 0.70:
        text = text.replace(
            "<title>", '<meta charset="windows-1252">\n<title>', 1)
        return text.encode("cp1252"), truth
    return b"\xff\xfe" + text.encode("utf-16-le"), truth


def _build_html(rng: random.Random, lang: str, idx: int,
                host: str = "example.com") -> tuple[bytes, str]:
    """Return (payload, ground-truth main plain text)."""
    title = _sentence(rng, lang, 4).rstrip(".")
    heads = []
    main_parts = []
    truth_parts = []

    h1 = _sentence(rng, lang, rng.randint(3, 6)).rstrip(".")
    main_parts.append(f"<h1>{h1}</h1>")
    truth_parts.append(h1)

    n_sections = rng.randint(1, 3)
    for s in range(n_sections):
        h2 = _sentence(rng, lang, rng.randint(2, 5)).rstrip(".")
        main_parts.append(f"<h2>{h2}</h2>")
        truth_parts.append(h2)
        for _ in range(rng.randint(1, 4)):
            p = _paragraph(rng, lang)
            style = rng.random()
            if style < 0.15:
                words = p.split(" ")
                k = rng.randrange(max(1, len(words) - 3))
                words[k] = f"<strong>{words[k]}</strong>"
                if len(words) > k + 2:
                    words[k + 2] = f"<em>{words[k + 2]}</em>"
                html_p = " ".join(words)
            elif style < 0.25:
                words = p.split(" ")
                k = rng.randrange(max(1, len(words) - 1))
                words[k] = f'<a href="https://ref.example/{idx}">{words[k]}</a>'
                html_p = " ".join(words)
            elif style < 0.32:
                html_p = p.replace(" data ", " &amp; data ").replace(
                    " el ", " &amp; el ").replace(" der ", " &amp; der ")
            else:
                html_p = p
            closing = "" if rng.random() < 0.1 else "</p>"  # unclosed <p>
            main_parts.append(f"<p>{html_p}{closing}")
            truth_parts.append(p)

    if rng.random() < 0.5:
        items = [_sentence(rng, lang, rng.randint(3, 6)) for _ in range(rng.randint(3, 6))]
        tag = "ul" if rng.random() < 0.7 else "ol"
        lis = "".join(f"<li>{it}" + ("</li>" if rng.random() > 0.2 else "")
                      for it in items)
        main_parts.append(f"<{tag}>{lis}</{tag}>")
        truth_parts.extend(items)

    if rng.random() < 0.3:
        rows = [[_sentence(rng, lang, 2).rstrip("."), str(rng.randint(1, 999))]
                for _ in range(rng.randint(2, 4))]
        body = "".join(f"<tr><td>{a}</td><td>{b}</td></tr>" for a, b in rows)
        main_parts.append(
            "<table><tr><th>Name</th><th>Value</th></tr>" + body + "</table>")
        truth_parts.extend(a for a, _ in rows)

    if rng.random() < 0.25:
        code = "\n".join(f"x{j} = compute({j})" for j in range(rng.randint(2, 5)))
        main_parts.append(f"<pre><code>{code}</code></pre>")
        truth_parts.append(code)

    if rng.random() < 0.2:
        q = _paragraph(rng, lang)
        main_parts.append(f"<blockquote><p>{q}</p></blockquote>")
        truth_parts.append(q)

    nav = _link_farm(rng, rng.randint(8, 16))
    # deterministic self-permalink on ~60% of pages (real-web header
    # idiom) — the one outlink class that resolves to a CRAWLED url, so
    # frontier discovery's anti-join has genuine hits. Dedicated rng:
    # main content stream stays untouched (same rule as _head_extras).
    prng = random.Random(0x9E44F00D ^ (idx * 2654435761))
    permalink = (f'<a href="https://{host}/{lang}/page-{idx:06d}.html">'
                 f'permalink</a> ' if prng.random() < 0.6 else "")
    footer = _link_farm(rng, rng.randint(5, 10))
    aside = _paragraph(rng, "en")[:80]
    ad = "Buy now! " + _link_farm(rng, 3)

    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title}</title>
{_head_extras(idx, lang, host, title)}
<style>body {{ margin: 0; }} .ads {{ color: red }}</style>
<script>var t = "tracker"; load(t);</script>
</head>
<body>
<header><div class="logo">SiteLogo</div>{permalink}{_link_farm(rng, 4)}</header>
<nav class="main-nav">{nav}</nav>
<div class="ads">{ad}</div>
<main>
<article>
{chr(10).join(main_parts)}
</article>
</main>
<aside class="sidebar">{aside}</aside>
<div class="cookie-banner">We use cookies. <a href="/accept">Accept</a></div>
<footer>{footer}<p>© 2025 Example Corp</p></footer>
</body>
</html>"""
    truth = "\n".join(truth_parts)
    return html.encode("utf-8"), truth


# Standard-security-handler variants the extractor reads with an EMPTY
# user password (owner-restriction-only files — the common real-world
# "encrypted" PDF a crawl hits; reference reads them via qpdf).
ENC_VARIANTS = {
    "rc4_40": dict(v=1, r=2, bits=40, aes=False),
    "rc4_128": dict(v=2, r=3, bits=128, aes=False),
    "aesv2": dict(v=4, r=4, bits=128, aes=True),
    # ISO 32000-2 AES-256 (Algorithm 2.B derivation) — round 4
    "aesv3": dict(v=5, r=6, bits=256, aes=True),
}


def build_minimal_pdf(pages_lines: list[list[str]], compress_mask: list[bool],
                      encrypt: dict | None = None) -> bytes:
    """Well-formed single-xref PDF with one content stream per page.

    ``encrypt`` (optional): ``{"variant": key into ENC_VARIANTS,
    "user_pw": bytes, "id0": 16 bytes, "ivs": [16 bytes per page]}`` —
    produces a genuinely Standard-handler-encrypted file (real Algorithm
    2/3/5 key derivation, per-object stream keys; encryption applied AFTER
    FlateDecode compression per ISO 32000-1 §7.6.2 so readers decrypt
    first, then run filters)."""
    objs: list[bytes] = []
    decryptor = None
    ivs: list[bytes] = []
    ue_entry = oe_entry = perms_entry = None
    if encrypt is not None:
        spec = ENC_VARIANTS[encrypt["variant"]]
        nbytes = spec["bits"] // 8
        user_pw = encrypt.get("user_pw", b"")
        id0 = encrypt["id0"]
        ivs = encrypt["ivs"]
        p_flags = -44
        if spec["v"] == 5:
            # per-doc 256-bit file key derived from the id0 draw; salts
            # are CORPUS-WIDE constants — a producer-reused-salt corpus,
            # so the deliberately-expensive Algorithm 2.B KDF (a ~0.4 s
            # pure-Python password hash, per spec) amortizes through
            # hash_2b's lru_cache at both build and extraction time.
            # Every doc still carries genuinely AES-256-encrypted
            # streams under its own key.
            import hashlib as _hl
            file_key = _hl.sha256(b"aesv3-key" + id0).digest()
            u_entry, ue_entry = compute_u_ue_r6(
                user_pw, file_key, b"r6-fx-vs", b"r6-fx-ks", spec["r"])
            o_entry, oe_entry = compute_o_oe_r6(
                b"owner-secret", file_key, u_entry,
                b"r6-fx-ov", b"r6-fx-ok", spec["r"])
            perms_entry = compute_perms_r6(p_flags, True, file_key,
                                           rand4=id0[:4])
            decryptor = StandardDecryptor(file_key, True, v5=True)
        else:
            o_entry = compute_o(b"owner-secret", user_pw, spec["r"], nbytes)
            key = compute_key(o_entry, p_flags, id0, spec["r"], nbytes,
                              password=user_pw)
            u_entry = compute_u(key, id0, spec["r"])
            decryptor = StandardDecryptor(key, spec["aes"])

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    n_pages = len(pages_lines)
    # obj 1: catalog, obj 2: pages, obj 3: font; page i -> obj 4+2i, content 5+2i
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(pages_lines):
        content = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                content.append("0 -14 Td")
            content.append(f"({esc(line)}) Tj")
        content.append("ET")
        stream = "\n".join(content).encode("latin-1")
        filt = b""
        if compress_mask[i]:
            stream = zlib.compress(stream, 6)
            filt = b" /Filter /FlateDecode"
        if decryptor is not None:
            stream = decryptor.encrypt(5 + 2 * i, 0, stream, iv=ivs[i])
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * i} 0 R >>".encode())
        objs.append(b"<< /Length " + str(len(stream)).encode() + filt
                    + b" >>\nstream\n" + stream + b"\nendstream")

    trailer_extra = ""
    if encrypt is not None:
        spec = ENC_VARIANTS[encrypt["variant"]]
        if spec["v"] == 5:
            filt_entry = (b"/V 5 /R " + str(spec["r"]).encode()
                          + b" /Length 256 /CF << /StdCF << /CFM /AESV3"
                          b" /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                          + b" /UE <" + ue_entry.hex().encode() + b">"
                          + b" /OE <" + oe_entry.hex().encode() + b">"
                          + b" /Perms <" + perms_entry.hex().encode()
                          + b">")
        elif spec["v"] == 4:
            cfm = b"/AESV2" if spec["aes"] else b"/V2"
            filt_entry = (b"/V 4 /R 4 /Length " + str(spec["bits"]).encode()
                          + b" /CF << /StdCF << /CFM " + cfm
                          + b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF")
        elif spec["v"] == 2:
            filt_entry = b"/V 2 /R 3 /Length " + str(spec["bits"]).encode()
        else:
            filt_entry = b"/V 1 /R 2"
        objs.append(b"<< /Filter /Standard " + filt_entry
                    + b" /O <" + o_entry.hex().encode() + b">"
                    + b" /U <" + u_entry.hex().encode() + b">"
                    + b" /P " + str(p_flags).encode() + b" >>")
        id_hex = encrypt["id0"].hex()
        trailer_extra = (f" /Encrypt {len(objs)} 0 R"
                         f" /ID [<{id_hex}> <{id_hex}>]")

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(f"{n} 0 obj\n".encode())
        out.write(body)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(f"xref\n0 {len(objs) + 1}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R"
              f"{trailer_extra} >>\n"
              f"startxref\n{xref_at}\n%%EOF\n".encode())
    return out.getvalue()


def _rand_bytes(rng: random.Random, n: int) -> bytes:
    return bytes(rng.getrandbits(8) for _ in range(n))


def _build_pdf(rng: random.Random, lang: str) -> tuple[bytes, str]:
    """~65% plaintext PDFs, ~30% Standard-handler-encrypted with an empty
    user password (extractor decrypts → same truth as plaintext), ~5%
    genuinely user-passworded (extractor tags ``encrypted`` → truth '')."""
    n_pages = rng.randint(1, 3)
    pages_lines = []
    compress = []
    for _ in range(n_pages):
        lines = [_sentence(rng, lang, rng.randint(4, 9)) for _ in range(rng.randint(3, 8))]
        pages_lines.append(lines)
        compress.append(rng.random() < 0.5)
    enc_draw = rng.random()
    encrypt = None
    readable = True
    if enc_draw < 0.35:
        # AES-256 R6 is the newest scheme — a real crawl's encrypted-PDF
        # population skews old, so aesv3 gets a 1/8 minority share and
        # the three legacy variants split the rest evenly (single draw,
        # deterministic)
        vdraw = rng.random()
        variant = ("aesv3" if vdraw < 0.125 else
                   ["rc4_40", "rc4_128", "aesv2"][int(vdraw * 1000) % 3])
        readable = enc_draw >= 0.05  # the first 5%: real user password
        encrypt = {
            "variant": variant,
            "user_pw": b"" if readable else b"fixture-user-pw",
            "id0": _rand_bytes(rng, 16),
            "ivs": [_rand_bytes(rng, 16) for _ in range(n_pages)],
        }
    payload = build_minimal_pdf(pages_lines, compress, encrypt=encrypt)
    truth = ("".join("\n".join(lines) + "\n\f" for lines in pages_lines)
             if readable else "")
    return payload, truth


def _build_docx(rng: random.Random, lang: str) -> tuple[bytes, str]:
    """OOXML exercising the full U3 surface: heading/plain/list paragraphs,
    bold/italic runs, hyperlinks (rels part), pipe tables."""
    truth = []
    body = []

    def run(text: str, bold: bool = False, italic: bool = False) -> str:
        rpr = ""
        if bold or italic:
            rpr = ("<w:rPr>" + ("<w:b/>" if bold else "")
                   + ("<w:i/>" if italic else "") + "</w:rPr>")
        return f"<w:r>{rpr}<w:t>{text}</w:t></w:r>"

    h = _sentence(rng, lang, 3).rstrip(".")
    body.append(f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>{run(h)}</w:p>')
    truth.append(h)
    rels = []
    for _ in range(rng.randint(2, 5)):
        p = _paragraph(rng, lang)
        runs = [run(p)]
        r = rng.random()
        if r < 0.3:
            extra = _sentence(rng, lang, 3)
            runs.append(run(extra, bold=True))
            truth.append(p + extra)
        elif r < 0.5:
            anchor = _sentence(rng, lang, 2).rstrip(".")
            rid = f"rId{len(rels) + 10}"
            rels.append((rid, f"https://link.example/{len(rels)}"))
            runs.append(f'<w:hyperlink r:id="{rid}">{run(anchor)}</w:hyperlink>')
            truth.append(p + anchor)
        else:
            truth.append(p)
        body.append(f"<w:p>{''.join(runs)}</w:p>")
    for _ in range(rng.randint(0, 3)):
        item = _sentence(rng, lang, rng.randint(3, 6))
        body.append(f'<w:p><w:pPr><w:pStyle w:val="ListParagraph"/></w:pPr>'
                    f"{run(item)}</w:p>")
        truth.append(item)
    if rng.random() < 0.5:
        n_cols = rng.randint(2, 3)
        rows_out = []
        for _ in range(rng.randint(2, 4)):
            cells = [_sentence(rng, lang, 2).rstrip(".") for _ in range(n_cols)]
            truth.extend(cells)
            rows_out.append("<w:tr>" + "".join(
                f"<w:tc><w:p>{run(c)}</w:p></w:tc>" for c in cells) + "</w:tr>")
        body.append("<w:tbl>" + "".join(rows_out) + "</w:tbl>")
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    r_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{w}" xmlns:r="{r_ns}">'
           f'<w:body>{"".join(body)}</w:body></w:document>')
    rels_xml = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">'
                + "".join(f'<Relationship Id="{rid}" Type="http://schemas.'
                          f'openxmlformats.org/officeDocument/2006/'
                          f'relationships/hyperlink" Target="{t}" '
                          f'TargetMode="External"/>' for rid, t in rels)
                + "</Relationships>")
    buf = io.BytesIO()
    # Fixed zip-entry timestamps: payload bytes must be run-independent.
    fixed_dt = (2025, 6, 1, 0, 0, 0)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        entries = [
            ("[Content_Types].xml",
             '<?xml version="1.0"?><Types '
             'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'),
            ("word/document.xml", doc),
        ]
        if rels:
            entries.append(("word/_rels/document.xml.rels", rels_xml))
        for name, payload in entries:
            zi = zipfile.ZipInfo(name, date_time=fixed_dt)
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue(), "\n".join(truth)


def gen_pages(n: int, seed: int = 42,
              oversize_bytes: int = 300_000) -> pa.Table:
    rng = random.Random(seed)
    urls, tss, payloads, texts, langs = [], [], [], [], []
    for i in range(n):
        host = rng.choices(HOSTS, weights=_HOST_WEIGHTS, k=1)[0]
        lang = rng.choices(["en", "es", "de"], weights=[6, 3, 1], k=1)[0]
        r = rng.random()
        if r < 0.78:
            ext = "html"
            payload, truth = _build_html(rng, lang, i, host)
            if r >= 0.765:
                # legacy-charset variant: same rng consumption as the
                # plain branch (zero drift for every other page), .htm
                # suffix keeps the utf-8-only pages-tier queries clean
                ext = "htm"
                payload, truth = _legacy_encode(payload, truth, i)
        elif r < 0.88:
            ext = "pdf"
            payload, truth = _build_pdf(rng, lang)
        elif r < 0.92:
            ext = "docx"
            payload, truth = _build_docx(rng, lang)
        elif r < 0.96:
            ext = "jpg"
            payload = b"\xff\xd8\xff\xe0" + bytes(rng.getrandbits(8) for _ in range(64))
            truth = ""
        else:
            ext = "zip"
            payload = b"PK\x05\x06" + bytes(rng.getrandbits(8) for _ in range(64))
            truth = ""
        # a few oversize html docs to exercise the size gate (scaled limit)
        if ext == "html" and i % 97 == 0:
            filler = "<p>" + "pad " * (oversize_bytes // 4) + "</p>"
            payload = payload.replace(b"</article>",
                                      filler.encode() + b"</article>")
        url = f"https://{host}/{lang}/page-{i:06d}.{ext}"
        ts = BASE_TS + timedelta(minutes=(i * 7) % (48 * 60))
        urls.append(url)
        tss.append(ts)
        payloads.append(payload)
        texts.append(truth)
        langs.append(lang)
    # one robots.txt per host, appended AFTER the page loop (dedicated
    # rng — zero drift for the page rows). Not extractable content: the
    # format gate rejects them (correct — robots.txt is crawl-control
    # metadata, consumed by operators/robots.py, never by extraction).
    sitemap_hosts: list[tuple[int, str]] = []
    for k, host in enumerate(HOSTS):
        rrng = random.Random(0x0B075 ^ (k * 2654435761))
        lines = ["User-agent: *"]
        if rrng.random() < 0.90:   # a few hosts publish delay-only files
            lines.append("Disallow: /admin")
        lang_dis = None
        if rrng.random() < 0.35:
            lang_dis = rrng.choice(['de', 'es'])
            lines.append(f"Disallow: /{lang_dis}/")
        if rrng.random() < 0.25:
            lines.append(f"Disallow: /cat/{rrng.randint(1, 99)}")
        if rrng.random() < 0.50:
            lines.append(f"Crawl-delay: {rrng.randint(1, 10)}")
        # round-4 directives, drawn strictly AFTER the round-3 ones so
        # every earlier body line is byte-identical (dedicated rng, but
        # keep the stream append-only anyway):
        # an Allow carve-out UNDER a language Disallow — the case where
        # Google longest-match precedence disagrees with any-Disallow
        # prefix matching (some /de/page-0001xx fetches are rescued)
        if lang_dis is not None and rrng.random() < 0.60:
            lines.append(f"Allow: /{lang_dis}/page-0001")
        if rrng.random() < 0.80:
            lines.append(f"Sitemap: https://{host}/sitemap.xml")
            sitemap_hosts.append((k, host))
            # some hosts declare a SECOND sitemap that is never planted
            # (multiple Sitemap: lines are legal; the directives audit
            # must report it as a frontier candidate, not drop it)
            if rrng.random() < 0.30:
                lines.append(f"Sitemap: https://{host}/sitemap-news.xml")
        urls.append(f"https://{host}/robots.txt")
        tss.append(BASE_TS)
        payloads.append(("\n".join(lines) + "\n").encode("ascii"))
        texts.append("")
        langs.append("en")
    # round 4: one sitemap.xml per host that DECLARED one, appended
    # after the robots loop (dedicated rng per host — zero drift for
    # every earlier row). XML is crawl metadata: the sniffer routes it
    # to 'xml' and the gate rejects it from extraction (like
    # robots.txt); operators/sitemap.py is the consumer. Each <url>
    # entry stays on ONE line so single-line regex scans parse it.
    html_by_host: dict[str, list[str]] = {}
    for u in urls:
        if u.endswith(".html"):
            html_by_host.setdefault(u.split("/")[2], []).append(u)
    for k, host in sitemap_hosts:
        srng = random.Random(0x517E ^ (k * 2654435761))
        entries = []
        for j, loc in enumerate(html_by_host.get(host, [])[::7][:40]):
            # ~1/3 of listed pages changed AFTER the crawl window
            # (lastmod > warc_ts -> recrawl due); the rest predate it
            if srng.random() < 0.35:
                lm = BASE_TS + timedelta(days=3, hours=j % 24)
            else:
                lm = BASE_TS - timedelta(days=2, hours=j % 24)
            freq = ("daily", "weekly", "monthly")[j % 3]
            prio = ("0.9", "0.5", "0.3")[j % 3]
            # every 5th entry uses the DATE-ONLY W3C Datetime form
            # sitemaps.org allows (parsers must accept both)
            lm_s = (lm.strftime("%Y-%m-%d") if j % 5 == 4
                    else lm.strftime("%Y-%m-%dT%H:%M:%SZ"))
            entries.append(
                f"<url><loc>{loc}</loc>"
                f"<lastmod>{lm_s}</lastmod>"
                f"<changefreq>{freq}</changefreq>"
                f"<priority>{prio}</priority></url>")
        # a few never-crawled locs (frontier-discovery candidates;
        # no lastmod — optional per the sitemaps.org schema)
        for _ in range(1 + srng.randint(0, 3)):
            entries.append(f"<url><loc>https://{host}/en/"
                           f"page-9{srng.randint(0, 99999):05d}.html"
                           f"</loc></url>")
        xml = ('<?xml version="1.0" encoding="UTF-8"?>\n'
               '<urlset xmlns='
               '"http://www.sitemaps.org/schemas/sitemap/0.9">\n'
               + "\n".join(entries) + "\n</urlset>\n")
        urls.append(f"https://{host}/sitemap.xml")
        tss.append(BASE_TS)
        payloads.append(xml.encode("ascii"))
        texts.append("")
        langs.append("en")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def gen_goldens(pages: pa.Table) -> pa.Table:
    urls = pages.column("url").to_pylist()
    payloads = pages.column("html").to_pylist()
    md, plain, gdocs, errs = [], [], [], []
    for url, payload in zip(urls, payloads):
        res = extract_document(payload, url)
        md.append(res.markdown)
        plain.append(format_plain_text(res.markdown) if res.markdown is not None else None)
        gdocs.append(format_google_docs(res.markdown) if res.markdown is not None else None)
        errs.append(res.error)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "markdown": pa.array(md, pa.large_string()),
            "plain_text": pa.array(plain, pa.large_string()),
            "google_docs": pa.array(gdocs, pa.large_string()),
            "error": pa.array(errs, pa.string()),
        }
    )


def materialize(scale: str, outdir: str, seed: int = 42) -> tuple[str, str]:
    n = SCALES[scale]
    os.makedirs(outdir, exist_ok=True)
    pages = gen_pages(n, seed)
    goldens = gen_goldens(pages)
    p_path = os.path.join(outdir, f"pages_{scale}.parquet")
    g_path = os.path.join(outdir, f"goldens_{scale}.parquet")
    # Small row groups: a single-row-group file gives Spark exactly ONE scan
    # task no matter what maxPartitionBytes says (measured: it serialized the
    # whole map stage and capped cluster utilization at ~12/32 cores).
    pq.write_table(pages, p_path, compression="zstd", row_group_size=512)
    pq.write_table(goldens, g_path, compression="zstd", row_group_size=512)
    return p_path, g_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=sorted(SCALES), default="smoke")
    ap.add_argument("--outdir", default=os.path.join(os.path.dirname(__file__), "data"))
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    p, g = materialize(args.scale, args.outdir, args.seed)
    print(p)
    print(g)
