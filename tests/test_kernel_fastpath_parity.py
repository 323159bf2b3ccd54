"""Round-7 fast-path parity: the optimized kernel paths must be
field-identical to the general paths on the SAME config.

Round 7 added three conditional fast paths to the extraction kernel:

* ``_linearize_fast`` (inline renumbering, used when span dropping is
  tag-only — ``TagFilter._alone_drop_set is not None``),
* ``_minify_clean_tree`` (fused minify+rewrite walk, used when every
  subtree-removal decision is text-free — ``_fused_rewrite_ok``),
* the ``minify._collapse`` already-collapsed precheck.

The golden suites pin absolute outputs; this test pins the INTERNAL
two-path equivalence directly by forcing the general machinery on the
same extractor and comparing every span field — so a future edit that
touches only one path cannot silently diverge.
"""

import pytest

from mini_html_parser_spark.kernel.config import NAMED_CONFIGS
from mini_html_parser_spark.kernel.extract import _Extractor


def _span_key(s):
    return (
        s.char_start_idx, s.relative_start_pos, s.char_end_idx,
        s.relative_end_pos, s.value, s.key, s.type, s.kind, s.media_ref,
        s.offset, tuple(s.attrs),
        tuple(v if v is not None else "" for v in s.attr_values),
    )


def _force_general(ex: _Extractor) -> None:
    """Disable both round-7 fast paths on an extractor instance."""
    ex.tag_filter._alone_drop_set = None
    ex._fused_rewrite_ok = False


def _docs():
    from mini_html_parser_spark import datagen

    docs = []
    for i in (0, 1, 7, 42, 100, 311):  # mixed family draws
        spans = datagen._doc_spans(42, i)
        parts = []
        for s in sorted(spans, key=lambda x: x["offset"]):
            if s["kind"] == "media":
                parts.append(f'<img src="{s["media_ref"] or ""}" alt="">')
            else:
                parts.append(s["text"] or "")
        docs.append("".join(parts))
    # hand-built edge cases: pre with comments, nbsp runs, folded div
    # chains, media, br runs, script raw text, malformed recovery
    docs += [
        "<body><pre>a <!--c--> b\t\tc</pre>tail  <div><div>x</div></div></body>",
        "<body><p>a&nbsp;&nbsp;b</p><br><br><img src='u'>t</body>",
        "<body><script>var x = '<p>not a tag</p>';</script><p>keep</p></body>",
        "<body><p> broken </><a href='x''>l</a></body>",
        "<body></body>",
        "no tags at all",
    ]
    return docs


@pytest.mark.parametrize("cfg_name", ["boilerplate_strip", "boilerplate_strip_br", "density_prune"])
def test_fast_paths_match_general_paths(cfg_name):
    cfg_factory = NAMED_CONFIGS[cfg_name]
    for html in _docs():
        fast_ex = _Extractor(cfg_factory())
        slow_ex = _Extractor(cfg_factory())
        assert fast_ex.tag_filter._alone_drop_set is not None
        assert fast_ex._fused_rewrite_ok
        _force_general(slow_ex)

        fast = fast_ex.run(html)
        slow = slow_ex.run(html)

        assert fast.text == slow.text
        assert fast.malformed == slow.malformed
        assert [_span_key(s) for s in fast.spans] == [
            _span_key(s) for s in slow.spans
        ]


def test_general_path_still_used_for_length_rules():
    """A config with length-dependent rules must NOT take the fast
    paths (the guards are the validity condition)."""
    from mini_html_parser_spark.kernel.config import (
        ExtractionConfig, TagToRemove, TagToRemoveWithContent,
    )

    cfg = ExtractionConfig(
        tags_to_remove_alone=[TagToRemove("span", content_min_char_length=3)],
        tags_to_remove_with_content=[
            TagToRemoveWithContent("div", content_max_char_length=10)
        ],
    )
    ex = _Extractor(cfg)
    assert ex.tag_filter._alone_drop_set is None
    assert not ex._fused_rewrite_ok
    # and it still produces output through the two-phase machinery
    r = ex.run("<body><div>0123456789longer</div><span>ab</span>x</body>")
    assert r.text
