"""HTML DOM → Markdown serializer with density-based block classification.

Reproduces the *shape* of MarkItDown 0.1.0's HTML conversion (the black-box
operator the reference invokes at /root/reference/app/main.py:383-391,530,687:
ATX headings, ``**``/``*`` emphasis, ``[text](href)`` links, ``-``/``1.``
lists, pipe tables, fenced code) with the north-rule boilerplate classifier
from :mod:`.boilerplate` deciding which blocks survive.

Determinism contract (SURVEY.md §7.4.1): output is a function of input bytes
only — fixed wrap constants, integer density math, no locale/platform
dependence; blocks joined with ``"\\n\\n"``, no trailing newline.

Pure Python; shared verbatim by the golden-fixture generator and the Spark
``mapInArrow`` UDF so byte-identity per url holds by construction and tests
pin Arrow round-trip fidelity.
"""

from __future__ import annotations

from dataclasses import dataclass

from .boilerplate import (
    BLOCK_TAGS,
    HEADING_TAGS,
    MAIN_TAGS,
    PRUNE_TAGS,
    anchor_chars,
    collapse_ws,
    deny_attrs,
    keep_block,
    text_and_anchor_stats,
)
from .html_dom import Node, parse_html


@dataclass
class Block:
    kind: str          # heading | text | list | table | pre | quote | rule
    md: str            # serialized markdown for the block
    chars: int         # collapsed plain-text length
    anchors: int       # collapsed anchor-text length
    in_main: bool      # has a <main>/<article> ancestor
    level: int = 0     # heading level (kind == "heading")


# ---------------------------------------------------------------------------
# Inline serialization
# ---------------------------------------------------------------------------

_EMPHASIS = {"strong": "**", "b": "**", "em": "*", "i": "*"}


def inline_md(node: Node) -> str:
    """Serialize an element's content to inline markdown (whitespace
    collapsed, not stripped)."""
    ch = node.children
    if len(ch) == 1 and ch[0].tag is None:
        # single-text-node element (most paragraphs): skip the list+join
        return collapse_ws(ch[0].text)
    parts: list[str] = []
    for c in ch:
        parts.append(_inline_one(c))
    return "".join(parts)


def _inline_one(node: Node) -> str:
    if node.tag is None:
        return collapse_ws(node.text)
    tag = node.tag
    if tag == "br":
        return "\n"
    if tag == "img":
        alt = collapse_ws(node.attr("alt")).strip()
        src = node.attr("src").strip()
        return f"![{alt}]({src})"
    inner = inline_md(node)
    if tag in _EMPHASIS:
        m = _EMPHASIS[tag]
        body = inner.strip()
        return f"{m}{body}{m}" if body else ""
    if tag == "a":
        text = inner.strip()
        href = node.attr("href").strip()
        if not text:
            return ""
        return f"[{text}]({href})" if href else text
    if tag == "code":
        body = inner.strip()
        return f"`{body}`" if body else ""
    if tag in ("sub", "sup", "span", "small", "u", "s", "abbr", "time",
               "mark", "cite", "q", "var", "kbd", "samp", "label", "font"):
        return inner
    if tag in BLOCK_TAGS or tag in HEADING_TAGS:
        # Block element nested in an inline context (bad markup): flatten.
        return inner
    return inner


# ---------------------------------------------------------------------------
# Block serialization
# ---------------------------------------------------------------------------

def _plain_len(node: Node) -> int:
    return len(collapse_ws(node.iter_text()).strip())


def _mk_block(kind: str, md: str, node: Node, in_main: bool, level: int = 0) -> Block:
    text, anchors = text_and_anchor_stats(node)
    return Block(kind, md, len(collapse_ws(text).strip()), anchors, in_main, level)


def _serialize_list(node: Node, depth: int) -> str:
    ordered = node.tag == "ol"
    indent = "  " * depth
    lines: list[str] = []
    idx = 0
    for li in node.children:
        if li.is_text or li.tag != "li":
            continue
        idx += 1
        marker = f"{idx}." if ordered else "-"
        inline_parts: list[str] = []
        sublists: list[str] = []
        for c in li.children:
            if c.tag is not None and c.tag in ("ul", "ol"):
                sub = _serialize_list(c, depth + 1)
                if sub:
                    sublists.append(sub)
            else:
                inline_parts.append(_inline_one(c))
        text = collapse_ws("".join(inline_parts)).strip()
        if text or sublists:
            lines.append(f"{indent}{marker} {text}".rstrip())
            lines.extend(sublists)
    return "\n".join(lines)


def _cell_md(cell: Node) -> str:
    text = inline_md(cell).strip()
    return text.replace("\n", " ").replace("|", "\\|")


def _serialize_table(node: Node) -> str:
    rows: list[list[str]] = []
    for tr in node.find_all("tr"):
        cells = [c for c in tr.children if c.tag is not None and c.tag in ("td", "th")]
        if cells:
            rows.append([_cell_md(c) for c in cells])
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    out: list[str] = []
    header = rows[0] + [""] * (width - len(rows[0]))
    out.append("| " + " | ".join(header) + " |")
    out.append("| " + " | ".join(["---"] * width) + " |")
    for r in rows[1:]:
        r = r + [""] * (width - len(r))
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def _serialize_pre(node: Node) -> str:
    raw = node.iter_text()
    # Trim a single leading newline (typical after <pre>) and trailing ws.
    if raw.startswith("\n"):
        raw = raw[1:]
    raw = raw.rstrip()
    return f"```\n{raw}\n```"


def _serialize_quote(node: Node, in_main: bool) -> str:
    inner_blocks: list[Block] = []
    _walk_container(node, in_main, inner_blocks)
    body = "\n\n".join(b.md for b in inner_blocks if b.md)
    if not body:
        body = collapse_ws(node.iter_text()).strip()
    if not body:
        return ""
    return "\n".join(f"> {line}" if line else ">" for line in body.split("\n"))


_CONTAINER_TAGS = frozenset(
    {
        "body", "div", "section", "article", "main", "center", "figure",
        "details", "address", "fieldset", "#document", "html", "dl",
    }
)


def _walk_container(node: Node, in_main: bool, blocks: list[Block]) -> None:
    """Visit children of a container, emitting blocks; consecutive inline
    children group into an anonymous text block."""
    pending: list[Node] = []

    def flush() -> None:
        if not pending:
            return
        md = collapse_ws("".join(_inline_one(n) for n in pending)).strip()
        chars = len(collapse_ws("".join(n.iter_text() for n in pending)).strip())
        anchors = sum(anchor_chars(n) for n in pending if n.tag is not None)
        if md:
            blocks.append(Block("text", md, chars, anchors, in_main))
        pending.clear()

    for c in node.children:
        if c.tag is None:
            if c.text.strip():
                pending.append(c)
            continue
        tag = c.tag
        if tag in HEADING_TAGS:
            flush()
            text = inline_md(c).strip()
            if text:
                level = int(tag[1])
                blocks.append(_mk_block("heading", "#" * level + " " + text,
                                        c, in_main, level))
        elif tag == "p" or tag in ("figcaption", "summary", "dt", "dd"):
            flush()
            md = inline_md(c).strip()
            if md:
                blocks.append(_mk_block("text", md, c, in_main))
        elif tag in ("ul", "ol"):
            flush()
            md = _serialize_list(c, 0)
            if md:
                blocks.append(_mk_block("list", md, c, in_main))
        elif tag == "table":
            flush()
            md = _serialize_table(c)
            if md:
                blocks.append(_mk_block("table", md, c, in_main))
        elif tag == "pre":
            flush()
            blocks.append(_mk_block("pre", _serialize_pre(c), c, in_main))
        elif tag == "blockquote":
            flush()
            md = _serialize_quote(c, in_main)
            if md:
                blocks.append(_mk_block("quote", md, c, in_main))
        elif tag == "hr":
            flush()
            blocks.append(Block("rule", "---", 0, 0, in_main))
        elif tag in _CONTAINER_TAGS or tag in BLOCK_TAGS:
            flush()
            child_main = in_main or tag in MAIN_TAGS
            if _has_block_children(c):
                _walk_container(c, child_main, blocks)
            else:
                md = inline_md(c).strip()
                if md:
                    blocks.append(_mk_block("text", md, c, child_main))
        else:
            # Unknown/inline element at container level: anonymous text block.
            pending.append(c)
    flush()


def _has_block_children(node: Node) -> bool:
    return any(
        c.tag is not None and (c.tag in BLOCK_TAGS or c.tag in HEADING_TAGS
                           or c.tag in _CONTAINER_TAGS)
        for c in node.children
    )


# ---------------------------------------------------------------------------
# Document assembly
# ---------------------------------------------------------------------------

def _classify(blocks: list[Block]) -> list[Block]:
    """Apply density keep/drop; headings survive iff their section kept
    content (nearest following kept block before a same-or-higher heading)."""
    kept_flags = [False] * len(blocks)
    for i, b in enumerate(blocks):
        if b.kind == "heading":
            continue
        if b.kind == "rule":
            kept_flags[i] = b.in_main
            continue
        kept_flags[i] = keep_block(b.kind, b.chars, b.anchors, b.in_main)
        if b.kind == "text" and b.chars == 0 and b.md and b.in_main:
            kept_flags[i] = True  # image-only paragraph inside main content
    for i, b in enumerate(blocks):
        if b.kind != "heading":
            continue
        for j in range(i + 1, len(blocks)):
            nb = blocks[j]
            if nb.kind == "heading" and nb.level <= b.level:
                break
            if kept_flags[j]:
                kept_flags[i] = True
                break
    return [b for b, k in zip(blocks, kept_flags) if k]


def html_to_markdown(html: str) -> str:
    """Full U4+U5 pipeline: parse (boilerplate suppressed at build) →
    block-classify → serialize."""
    # Both boilerplate deny rules — PRUNE_TAGS and the class/id deny-list —
    # are applied during the parse itself: suppressed subtrees keep stack
    # discipline but are never attached and their text never materialized.
    # Byte-equivalent to build-then-prune, with one INTENTIONAL divergence:
    # a denied container nested beyond MAX_DEPTH suppresses its children
    # here, while build-then-prune would flatten them out as siblings at
    # the cap and keep them — suppression is the correct extraction
    # behavior (they ARE the boilerplate); pinned in tests.
    root = parse_html(html, PRUNE_TAGS, deny_attrs)
    top = root.find_first("body") or root
    blocks: list[Block] = []
    _walk_container(top, False, blocks)
    kept = _classify(blocks)
    return "\n\n".join(b.md for b in kept)
