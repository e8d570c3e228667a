"""Boilerplate stripping: Boilerpipe/trafilatura-style block classification.

North-rule addition (/root/repo/BASELINE.json:6,14 — "boilerplate stripping via
text-density and link-density DOM heuristics"): the reference delegates whole-
document conversion to MarkItDown (/root/reference/app/main.py:383-391) and
keeps everything; a Common-Crawl-scale pipeline must instead retain only main
content. This module prunes hard-boilerplate subtrees (nav/footer/ads …) and
classifies remaining text blocks by *text density* (chars per 80-col wrapped
line) and *link density* (anchor chars / total chars).

All decisions use integer arithmetic (``3*anchor <= chars`` instead of float
ratios — SURVEY.md §7.4.2) so classification never flips across platforms and
golden outputs stay byte-stable.

Pure Python; no Spark imports.
"""

from __future__ import annotations

import re

from .html_dom import Node

# Subtrees removed outright before block extraction.
PRUNE_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "head", "title",
        "nav", "header", "footer", "aside", "form", "button", "input",
        "select", "option", "textarea", "iframe", "svg", "canvas",
        "object", "embed", "applet", "map", "dialog",
    }
)

# class/id tokens that mark hard boilerplate (matched on word boundaries).
_DENY_CLASS = re.compile(
    r"(?:^|[\s_-])(?:nav|navbar|menu|footer|header|masthead|sidebar|side"
    r"|ads?|advert(?:isement)?|sponsor(?:ed)?|cookie|consent|gdpr|banner"
    r"|social|share|sharing|comments?|related|recommend(?:ed|ations?)?"
    r"|widget|breadcrumbs?|promo|popup|modal|overlay|subscribe|newsletter"
    r"|pagination|pager|skip|toolbar|byline-tools)(?:$|[\s_-])"
)

# Ancestor tags that mark a block as main content.
MAIN_TAGS = frozenset({"main", "article"})

# Block-level elements that terminate a text block.
BLOCK_TAGS = frozenset(
    {
        "address", "article", "blockquote", "body", "center", "dd", "div",
        "dl", "dt", "fieldset", "figure", "figcaption", "h1", "h2", "h3",
        "h4", "h5", "h6", "hr", "li", "main", "ol", "p", "pre", "section",
        "table", "ul", "details", "summary",
    }
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# Minimum collapsed chars for an out-of-main content block to survive.
MIN_BLOCK_CHARS = 25
# Wrap width used for text-density lines (Boilerpipe uses word-wrapped lines).
WRAP_COLS = 80
# Minimum chars-per-wrapped-line (text density) for out-of-main blocks.
MIN_DENSITY = 10


def is_denied(node: Node) -> bool:
    """True if this element subtree is hard boilerplate (tag or class/id).
    Delegates to :func:`deny_attrs` so the prune() reference spec and the
    builder's parse-time suppression can never desynchronize."""
    if node.tag in PRUNE_TAGS:
        return True
    return bool(node.attrs) and deny_attrs(node.tag, node.attrs)


def deny_attrs(tag: str, attrs: dict) -> bool:
    """Build-time twin of :func:`is_denied`'s class/id check (the tag check
    is handled by the builder's ``suppress_tags``). Same blob + regex, so
    suppressing at parse time == building fully then pruning."""
    if "class" not in attrs and "id" not in attrs:
        return False
    blob = ((attrs.get("class") or "") + " " + (attrs.get("id") or "")).lower()
    return bool(blob.strip()) and bool(_DENY_CLASS.search(blob))


def prune(node: Node) -> None:
    """Remove hard-boilerplate subtrees in place (pre-order)."""
    node.children = [c for c in node.children if c.tag is None or not is_denied(c)]
    for c in node.children:
        if c.tag is not None:
            prune(c)


def anchor_chars(node: Node) -> int:
    """Collapsed character count of text under ``<a>`` descendants."""
    total = 0
    stack = [(node, node.tag == "a")]
    while stack:
        n, in_a = stack.pop()
        if n.tag is None:
            if in_a:
                total += len(collapse_ws(n.text))
            continue
        for c in n.children:
            stack.append((c, in_a or c.tag == "a"))
    return total


def text_and_anchor_stats(node: Node) -> tuple[str, int]:
    """(unnormalized concatenated text, collapsed anchor chars) in ONE
    subtree traversal — the block builder needs both, and separate
    iter_text + anchor_chars walks would visit every node twice."""
    parts: list[str] = []
    anchors = 0
    stack = [(node, node.tag == "a")]
    while stack:
        n, in_a = stack.pop()
        if n.tag is None:
            parts.append(n.text)
            if in_a:
                anchors += len(collapse_ws(n.text))
            continue
        for c in reversed(n.children):
            stack.append((c, in_a or c.tag == "a"))
    return "".join(parts), anchors


_WS_RUN = re.compile(r"\s+")
# A string needs collapsing iff it has a 2+ whitespace run OR any whitespace
# char that isn't a plain space (\s is unicode-aware, so this covers \xa0 &c).
_WS_DIRTY = re.compile(r"\s\s|[^\S ]")


def collapse_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces (no strip)."""
    if _WS_DIRTY.search(text) is None:
        return text  # already collapsed — skip the allocating sub()
    return _WS_RUN.sub(" ", text)


def wrapped_lines(chars: int) -> int:
    """Number of WRAP_COLS-wrapped lines a run of ``chars`` occupies (>=1)."""
    return max(1, (chars + WRAP_COLS - 1) // WRAP_COLS)


def keep_block(kind: str, chars: int, anchors: int, in_main: bool) -> bool:
    """Density decision for one content block.

    ``kind`` is the block's structural class: ``heading`` blocks are decided
    separately (kept iff their section has kept content — see serializer);
    this function handles ``text`` / ``list`` / ``table`` / ``pre`` /
    ``quote`` blocks.

    Integer-only math: link density ≤ 1/3 is ``3*anchors <= chars``; main
    content tolerates up to 2/3 (``3*anchors <= 2*chars``).
    """
    if chars <= 0:
        return False
    if in_main:
        return 3 * anchors <= 2 * chars
    if kind in ("pre", "table", "quote"):
        return chars >= MIN_BLOCK_CHARS and 3 * anchors <= chars
    # text / list blocks outside main: size + link density + text density
    if chars < MIN_BLOCK_CHARS:
        return False
    if 3 * anchors > chars:
        return False
    return chars >= MIN_DENSITY * wrapped_lines(chars)
