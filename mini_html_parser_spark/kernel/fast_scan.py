"""Fast HTML scanner — a single-regex tokenizer frontend.

Drives the same DOM-builder sink as the stdlib ``html.parser`` path
(dom._DomParser), emitting the identical event stream for the
behaviors this engine pins (golden tests + the 2012-span wiki
fixture), at roughly 2-3× the speed: stdlib HTMLParser pays several
regex attempts, ``updatepos`` bookkeeping and method dispatch per
tag, which dominates kernel time on large documents.

Event-level compatibility notes (verified against the stdlib path by
the golden suite and a randomized cross-check test):

* ``</>`` emits a literal ``>`` text event (lxml recovery pinned by
  test_html_parser.py:578-583),
* character references resolve in text and attribute values but NOT
  inside script/style raw text (stdlib ``convert_charrefs``),
* a ``<`` that doesn't open a tag construct is literal text,
* comments/doctypes/processing instructions are consumed silently,
* ``<script>``/``<style>``/``<textarea>``/``<title>`` bodies are raw
  text until their matching close tag (stdlib CDATA_CONTENT_ELEMENTS
  is script/style only; the extended set matches libxml2, and only
  script/style matter to the extraction goldens — head-only tags
  never reach //body).
"""

from __future__ import annotations

import re
from html import unescape

_TAG_RE = re.compile(
    r"""<(?:
        (?P<comment>!--)
      | (?P<decl>![^>]*>?)
      | (?P<pi>\?[^>]*>?)
      | (?P<emptyend>/\s*>)
      | /(?P<end>[a-zA-Z][-.a-zA-Z0-9:_]*)[^>]*>
      | (?P<start>[a-zA-Z][^\t\n\r\f\ />\x00]*)   # stdlib tagfind_tolerant
        # quotes protect '>' only as attribute VALUES (preceded by =),
        # matching stdlib locatestarttagend_tolerant; '<' allowed
        # mid-tag (stdlib attrfind_tolerant)
        (?P<attrs>(?:=\s*"[^"]*"|=\s*'[^']*'|[^>])*?)
        (?P<selfclose>/?)>
    )""",
    re.VERBOSE | re.DOTALL,
)

# stdlib html.parser attrfind_tolerant, verbatim — attribute-splitting
# semantics are the equivalence contract with the stdlib-driven path
_ATTR_RE = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*'
)

_COMMENT_END_RE = re.compile(r"--\s*>")

# stdlib CDATA_CONTENT_ELEMENTS is (script, style); those are the two
# that matter for extraction (their content must not parse as markup)
_RAW_TEXT_TAGS = {"script", "style"}


def _parse_attrs(s: str) -> list:
    if not s or s.isspace():
        return []
    attrs = []
    # leading space gives position-0 the same lookbehind context the
    # stdlib matcher has right after the tag name
    for m in _ATTR_RE.finditer(" " + s):
        name = m.group(1).lower()
        if m.group(2) is None:
            attrs.append((name, None))
            continue
        value = m.group(3)
        if value[:1] in "\"'" and value[:1] == value[-1:] and len(value) >= 2:
            value = value[1:-1]
        if "&" in value:
            value = unescape(value)
        attrs.append((name, value))
    return attrs


def scan(html: str, sink) -> None:
    """Tokenize ``html`` and drive ``sink`` (a dom._DomParser-shaped
    object: handle_starttag/handle_startendtag/handle_endtag/
    handle_data)."""
    pos = 0
    n = len(html)
    find = html.find
    match = _TAG_RE.match
    data_parts: list[str] = []

    def flush_text(chunk: str) -> None:
        if chunk:
            if "&" in chunk:
                chunk = unescape(chunk)
            sink.handle_data(chunk)

    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            flush_text(html[pos:])
            break
        if lt > pos:
            flush_text(html[pos:lt])
        # '</>' → literal '>' (lxml recovery; dom.parse_endtag parity)
        if html.startswith("</>", lt):
            sink.handle_data(">")
            sink.malformed = True
            pos = lt + 3
            continue
        m = match(html, lt)
        if m is None:
            # lone '<' that opens nothing: literal text
            flush_text("<")
            pos = lt + 1
            continue

        # start tags dominate real documents — dispatch on them first
        # (each .group() lookup is measurable at 50k+ tags/doc)
        tag = m.group("start")
        if tag is not None:
            tag = tag.lower()
            attrs = _parse_attrs(m.group("attrs"))
            selfclose = m.group("selfclose")
            if selfclose:
                sink.handle_startendtag(tag, attrs)
            else:
                sink.handle_starttag(tag, attrs)
            pos = m.end()

            if tag in _RAW_TEXT_TAGS and not selfclose:
                # raw-text mode: consume until the matching close tag,
                # no charref resolution (stdlib convert_charrefs parity)
                cm2 = html.find(f"</{tag}", pos)
                if cm2 < 0:
                    cm2 = html.lower().find(f"</{tag}", pos)
                if cm2 < 0:
                    # unterminated raw-text element at EOF: stdlib
                    # drops the buffered CDATA on close()
                    pos = n
                    continue
                if cm2 > pos:
                    sink.handle_data(html[pos:cm2])
                gt = find(">", cm2)
                sink.handle_endtag(tag)
                pos = (gt + 1) if gt >= 0 else n
            continue

        end_name = m.group("end")
        if end_name is not None:
            sink.handle_endtag(end_name.lower())
            pos = m.end()
            continue
        if m.group("comment") is not None:
            end = _COMMENT_END_RE.search(html, m.end())
            if end is None:
                # unterminated comment at EOF: stdlib flushes the raw
                # remainder as text on close()
                flush_text(html[lt:])
                pos = n
                continue
            sink.handle_comment(html[m.end():end.start()])
            pos = end.end()
            continue
        if m.group("decl") is not None or m.group("pi") is not None:
            pos = m.end()
            continue
        # remaining constructs: comment handled above; decl/pi/emptyend
        # '</ >' style empty end tag: stdlib consumes silently for
        # '</>'-like forms; treat as recovery noise
        if m.group("emptyend") is not None:
            sink.malformed = True
        pos = m.end()
