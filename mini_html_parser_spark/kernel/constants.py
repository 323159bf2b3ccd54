"""HTML element classification constants.

These are public HTML element categories; the exact membership is the
capability contract pinned by the reference engine's constants
(reference: html_parser.py:12-91).  They drive text linearization:
block elements insert "\n" separators, inline-spacing elements insert
" " separators, everything else inserts nothing.
"""

FAKE_TAG_BLOCK = "fake_tag_block"
FAKE_TAG_INLINE = "fake_tag_inline"
FAKE_TAG_BASIC = "fake_tag_basic"

# reference: html_parser.py:16-67
BLOCK_ELEMENTS = [
    "address", "article", "aside", "blockquote", "body", "br", "button",
    "canvas", "caption", "col", "colgroup", "dd", "div", "dl", "dt",
    "embed", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
    "map", "noscript", "object", "ol", "output", "p", "pre", "progress",
    "section", "table", "tbody", "textarea", "tfoot", "th", "thead",
    "tr", "ul", "video",
    FAKE_TAG_BLOCK,
]

# reference: html_parser.py:69-87
INLINE_ELEMENTS_SPACING = [
    "address", "cite", "details", "datalist", "iframe", "img", "input",
    "label", "legend", "optgroup", "q", "select", "summary", "tbody",
    "td", "time",
    FAKE_TAG_INLINE,
]

PRE_TAG = "pre"
PLAIN_TEXT_SEPARATOR = " "
BLOCK_CONTENT_SEPARATOR = "\n"

# HTML void elements (may not have children / end tags are ignored).
# Public HTML spec list plus legacy elements libxml2 treats as empty.
VOID_ELEMENTS = frozenset({
    "area", "base", "basefont", "br", "col", "embed", "frame", "hr",
    "img", "input", "isindex", "keygen", "link", "meta", "param",
    "source", "spacer", "track", "wbr",
})

# Elements whose raw text content is preserved verbatim by the
# minifier (reference minifies with keep_pre=True, html_parser.py:446).
PRESERVE_WHITESPACE_TAGS = frozenset({"pre", "textarea"})

# Tags that belong in <head> when seen before <body> opens.
HEAD_TAGS = frozenset({"title", "base", "link", "meta", "style", "isindex"})

# Media elements: emitted as media-kind spans in the interleaved
# contract (BASELINE.json input_hint; reference treats img as an
# inline zero-length span carrying src, html_parser.py:75).
MEDIA_TAGS = frozenset({"img", "audio", "video", "source", "embed", "figure"})

# --- lenient-parser auto-close rules (libxml2-style HTML recovery) ---
# When a start tag T arrives and the innermost open element is P,
# P is implicitly closed if T is in AUTO_CLOSE[P].
_P_CLOSERS = {
    "address", "article", "aside", "blockquote", "center", "details",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hgroup", "hr", "main", "menu", "nav", "ol", "p", "pre", "section",
    "table", "ul", "li", "dt", "dd",
}
AUTO_CLOSE = {
    "p": _P_CLOSERS,
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr"},
    "td": {"td", "th", "tr"},
    "th": {"td", "th", "tr"},
    "thead": {"tbody", "tfoot"},
    "tbody": {"tbody", "tfoot"},
    "tfoot": {"tbody"},
    "option": {"option", "optgroup"},
    "optgroup": {"optgroup"},
    "colgroup": {
        "caption", "colgroup", "tbody", "tfoot", "thead", "tr", "td", "th",
    },
    "caption": {"colgroup", "tbody", "tfoot", "thead", "tr"},
    "head": {"body"},
}
