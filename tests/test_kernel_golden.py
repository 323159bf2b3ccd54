"""Golden kernel tests — every literal assertion from the reference's
test suite (reference: test_html_parser.py, 17 effective tests, plus
the toy span-dict test in parse_scripts/test_parse_natural_questions.py:17-39)
re-expressed against this engine's span schema.

Span-for-span the expected values are unchanged; only the accessor
spelling differs (``span.value`` is the tag string, attrs are the
parallel ``attrs``/``attr_values`` arrays of FIXTURES.md §2).
"""

from collections import defaultdict

import pytest

from mini_html_parser_spark.kernel import (
    TagToRemove,
    TagToRemoveWithContent,
    extract,
    ExtractionConfig,
)


def run(html, **kw):
    r = extract(html, ExtractionConfig(**kw))
    return r.text, r.spans


def attrs_dict(span):
    return {"attrs": list(span.attrs), "values": list(span.attr_values)}


def check_content_parsing(target_content_plain_text, target_metadata_tags, metadata, plain_text):
    # reference: test_html_parser.py:9-52
    target_list_tags = []
    for tag in target_content_plain_text:
        target_list_tags.extend([tag] * len(target_content_plain_text[tag]))
    for target_tag in target_list_tags:
        assert target_tag in target_metadata_tags
        target_metadata_tags.remove(target_tag)
        found = False
        for s in metadata:
            piece = plain_text[s.char_start_idx:s.char_end_idx]
            if s.value == target_tag and piece in target_content_plain_text[target_tag]:
                found = True
                target_content_plain_text[target_tag].remove(piece)
                if not target_content_plain_text[target_tag]:
                    target_content_plain_text.pop(target_tag)
                break
        assert found, (
            f"plain text not found for tag {target_tag!r}; got: "
            + "\n ".join(f"{s.value}: {plain_text[s.char_start_idx:s.char_end_idx]!r}" for s in metadata)
        )
    assert not target_content_plain_text
    assert not target_metadata_tags


def check_content_parsing_and_metadata(target_content_plain_text, target_metadata_tags, metadata, plain_text):
    # reference: test_html_parser.py:55-102
    target_list_tags = []
    for tag in target_content_plain_text:
        target_list_tags.extend([tag] * len(target_content_plain_text[tag]))
    for target_tag in target_list_tags:
        assert target_tag in target_metadata_tags
        target_metadata_tags.remove(target_tag)
        found = False
        for s in metadata:
            piece = plain_text[s.char_start_idx:s.char_end_idx]
            if (
                s.value == target_tag
                and attrs_dict(s) in [item[1] for item in target_content_plain_text[target_tag]]
                and piece in [item[0] for item in target_content_plain_text[target_tag]]
            ):
                found = True
                target_content_plain_text[target_tag].remove((piece, attrs_dict(s)))
                if not target_content_plain_text[target_tag]:
                    target_content_plain_text.pop(target_tag)
                break
        assert found, (
            f"plain text not found for tag {target_tag!r}; got: "
            + "\n ".join(
                f"{s.value}: {plain_text[s.char_start_idx:s.char_end_idx]!r} {attrs_dict(s)}"
                for s in metadata
            )
        )
    assert not target_content_plain_text
    assert not target_metadata_tags


SIMPLE_HTML = """
    <html>
    <head>
    </head>
    <body>
    <h1>This is a title</h1>
    </body>
    </html>
"""


def test_parse_simple_html():
    # reference: test_html_parser.py:105-133
    plain_text, metadata = run(SIMPLE_HTML)
    assert plain_text == "This is a title\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 2
    assert "html" not in tags and "head" not in tags
    assert "body" in tags and "h1" in tags
    h1 = next(s for s in metadata if s.value == "h1")
    assert plain_text[h1.char_start_idx:h1.char_end_idx] == "This is a title"


def test_parse_html_remove_tag_alone():
    # reference: test_html_parser.py:136-167
    plain_text, metadata = run(SIMPLE_HTML, tags_to_remove_alone=[TagToRemove("body")])
    assert plain_text == "This is a title\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 1
    assert tags == ["h1"]
    h1 = metadata[0]
    assert plain_text[h1.char_start_idx:h1.char_end_idx] == "This is a title"


def test_parse_html_remove_tag_and_content():
    # reference: test_html_parser.py:170-221
    html = """
    <html>
    <head>
    </head>
    <body>
    <h1>This is a title</h1>
    <div>
    <p>This is a first paragraph in div</p>
    <p>This is a second paragraph in div</p>
    </div>
    <p>This is a paragraph not in div</p>
    </body>
    </html>
"""
    plain_text, metadata = run(
        html, tags_to_remove_with_content=[TagToRemoveWithContent(tag="div")]
    )
    assert plain_text == "This is a title\nThis is a paragraph not in div\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 3
    assert "html" not in tags and "head" not in tags
    assert "body" in tags and "h1" in tags and "p" in tags
    h1 = next(s for s in metadata if s.value == "h1")
    assert plain_text[h1.char_start_idx:h1.char_end_idx] == "This is a title"
    p = next(s for s in metadata if s.value == "p")
    assert plain_text[p.char_start_idx:p.char_end_idx] == "This is a paragraph not in div"


NESTED_HTML = """
    <html>
    <head>
    </head>
    <body>
    <h1>This is a title</h1>
    <div>
    <div>This is a first sub-div in div</div>
    <div>This is a second sub-div in div</div>
    </div>
    <p>This is a paragraph not in div</p>
    </body>
    </html>
"""


def test_parse_html_nested_example():
    # reference: test_html_parser.py:224-274
    plain_text, metadata = run(NESTED_HTML)
    assert plain_text == (
        "This is a title\n"
        "This is a first sub-div in div\n"
        "This is a second sub-div in div\n"
        "This is a paragraph not in div\n"
    )
    tags = [s.value for s in metadata]
    assert len(metadata) == 6
    check_content_parsing(
        {
            "body": [
                "This is a title\nThis is a first sub-div in div\n"
                "This is a second sub-div in div\nThis is a paragraph not in div\n"
            ],
            "h1": ["This is a title"],
            "p": ["This is a paragraph not in div"],
            "div": [
                "This is a first sub-div in div",
                "This is a second sub-div in div",
                "This is a first sub-div in div\nThis is a second sub-div in div\n",
            ],
        },
        tags, metadata, plain_text,
    )


NESTED_HTML_2 = """
    <html>
    <head>
    </head>
    <body>
    <h1>This is a title</h1>
    <div>
    <div>This is a <div>first</div> sub-div in div</div>
    <div>This is a <div>second</div> sub-div in div</div>
    </div>
    <p>This is a paragraph not in div</p>
    </body>
    </html>
"""


def test_parse_html_nested_example_2():
    # reference: test_html_parser.py:277-338
    plain_text, metadata = run(NESTED_HTML_2)
    assert plain_text == (
        "This is a title\n"
        "This is a\nfirst\nsub-div in div\n"
        "This is a\nsecond\nsub-div in div\n"
        "This is a paragraph not in div\n"
    )
    tags = [s.value for s in metadata]
    assert len(metadata) == 8
    check_content_parsing(
        {
            "body": [
                "This is a title\nThis is a\nfirst\nsub-div in div\n"
                "This is a\nsecond\nsub-div in div\nThis is a paragraph not in div\n"
            ],
            "h1": ["This is a title"],
            "p": ["This is a paragraph not in div"],
            "div": [
                "first",
                "second",
                "This is a\nfirst\nsub-div in div",
                "This is a\nsecond\nsub-div in div",
                "This is a\nfirst\nsub-div in div\nThis is a\nsecond\nsub-div in div\n",
            ],
        },
        tags, metadata, plain_text,
    )


def test_parse_html_nested_example_max_length():
    # reference: test_html_parser.py:341-396
    plain_text, metadata = run(
        NESTED_HTML_2,
        tags_to_remove_with_content=[
            TagToRemoveWithContent(tag="div", content_max_char_length=6)
        ],
    )
    assert plain_text == (
        "This is a title\n"
        "This is a sub-div in div\n"
        "This is a sub-div in div\n"
        "This is a paragraph not in div\n"
    )
    tags = [s.value for s in metadata]
    assert len(metadata) == 6
    check_content_parsing(
        {
            "body": [
                "This is a title\nThis is a sub-div in div\n"
                "This is a sub-div in div\nThis is a paragraph not in div\n"
            ],
            "h1": ["This is a title"],
            "p": ["This is a paragraph not in div"],
            "div": [
                "This is a sub-div in div",
                "This is a sub-div in div",
                "This is a sub-div in div\nThis is a sub-div in div\n",
            ],
        },
        tags, metadata, plain_text,
    )


def test_parse_html_nested_example_min_length():
    # reference: test_html_parser.py:399-441
    html = """
    <html>
    <head>
    </head>
    <body>
    <h1>This is a title</h1>
    <div>small</div>
    <div>
    <div>This is a <div>first</div> sub-div in div</div>
    <div>This is a <div>second</div> sub-div in div</div>
    </div>
    <p>This is a paragraph not in div</p>
    </body>
    </html>
"""
    plain_text, metadata = run(
        html,
        tags_to_remove_with_content=[
            TagToRemoveWithContent(tag="div", content_min_char_length=7, method="top-down")
        ],
    )
    assert plain_text == "This is a title\nsmall\nThis is a paragraph not in div\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 4
    check_content_parsing(
        {
            "body": ["This is a title\nsmall\nThis is a paragraph not in div\n"],
            "h1": ["This is a title"],
            "p": ["This is a paragraph not in div"],
            "div": ["small"],
        },
        tags, metadata, plain_text,
    )


def test_remove_all_table():
    # reference: test_html_parser.py:444-491 (real Wikipedia markup w/ img)
    html = """<html><caption>
</caption>
<tbody><tr>
<th>&nbsp;</th>
<th colspan="4"><b><a href="/wiki/Jeux_olympiques_d%27%C3%A9t%C3%A9" title="">Jeux olympiques d'été</a></b>
</th>
<th>&nbsp;</th>
<th colspan="3"><b><a href="/wiki/Jeux_olympiques_d%27hiver" title="Jeux olympiques d'hiver">Jeux olympiques d'hiver</a></b>
</th></tr>
<tr>
<td>2032</td>
<td><a href="/wiki/Jeux_olympiques_d%27%C3%A9t%C3%A9_de_2032" title="Jeux olympiques d'été de 2032">XXXV</a></td>
<td><a href="/wiki/Brisbane" title="Brisbane">Brisbane</a> (1)</td>
<td><span class="datasortkey" data-sort-value="Australie"><span class="flagicon"><a href="//commons.wikimedia.org/wiki/File:Flag_of_Australia.svg?uselang=fr" class="image" title="Drapeau de l'Australie"><img alt="Drapeau de l'Australie" src="//upload.wikimedia.org/wikipedia/commons/thumb/b/b9/Flag_of_Australia.svg/20px-Flag_of_Australia.svg.png" decoding="async" class="noviewer thumbborder" srcset="//upload.wikimedia.org/wikipedia/commons/thumb/b/b9/Flag_of_Australia.svg/30px-Flag_of_Australia.svg.png 1.5x, //upload.wikimedia.org/wikipedia/commons/thumb/b/b9/Flag_of_Australia.svg/40px-Flag_of_Australia.svg.png 2x" data-file-width="1280" data-file-height="640" width="20" height="10"></a> </span><a href="/wiki/Australie" title="Australie">Australie</a></span> (3)</td>
<td><a href="/wiki/Oc%C3%A9anie" title="Océanie">Océanie</a> (3)</td>
<td></td>
<td></td>
<td></td>
<td>
</td></tr></tbody></html>"""
    plain_text, metadata = run(
        html,
        tags_to_remove_with_content=[
            TagToRemoveWithContent(tag="tbody"),
            TagToRemoveWithContent(tag="td"),
        ],
        attrs_to_keep=["class", "id"],
    )
    assert plain_text == ""
    tags = [s.value for s in metadata]
    assert len(metadata) == 2
    check_content_parsing({"body": [""], "caption": [""]}, tags, metadata, plain_text)


def test_table():
    # reference: test_html_parser.py:494-532
    html = """<html><table>
    <thead>
        <tr>
            <th colspan="2">The table header</th>
        </tr>
    </thead>
    <tbody>
        <tr>
            <td>The table body</td>
            <td>with two columns</td>
        </tr>
    </tbody>
</table></html>"""
    plain_text, metadata = run(
        html,
        tags_to_remove_with_content=[
            TagToRemoveWithContent(tag="table", content_min_char_length=54)
        ],
        attrs_to_keep=["class", "id"],
    )
    assert plain_text == ""
    tags = [s.value for s in metadata]
    assert len(metadata) == 1
    check_content_parsing({"body": [""]}, tags, metadata, plain_text)


def test_table_keep_everything():
    # reference: test_html_parser.py:535-573
    html = """<html><body><table>
    <thead>
        <tr>
            <th colspan="2">The table header</th>
        </tr>
    </thead>
    <tbody>
        <tr>
            <td>The table body</td>
            <td>with two columns</td>
        </tr>
    </tbody>
</table></body></html>"""
    plain_text, metadata = run(html)
    assert plain_text == "The table header\nThe table body with two columns\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 9
    check_content_parsing(
        {
            "table": ["The table header\nThe table body with two columns\n"],
            "thead": ["The table header\n"],
            "tr": ["The table header\n", "The table body with two columns\n"],
            "th": ["The table header"],
            "tbody": ["The table body with two columns\n"],
            "td": ["The table body", "with two columns"],
            "body": ["The table header\nThe table body with two columns\n"],
        },
        tags, metadata, plain_text,
    )


def test_behavior_on_corrupt_examples():
    # reference: test_html_parser.py:576-627
    plain_text, metadata = run("""<p> test </>""")
    assert plain_text == "test >\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 2
    check_content_parsing({"p": ["test >"], "body": ["test >\n"]}, tags, metadata, plain_text)
    assert attrs_dict(metadata[0]) == {"attrs": [], "values": []}

    plain_text, metadata = run('''<a href="http://example.com""> test </a>''')
    assert plain_text == "test\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 2
    check_content_parsing({"a": ["test\n"], "body": ["test\n"]}, tags, metadata, plain_text)
    assert attrs_dict(metadata[0]) == {"attrs": ["href"], "values": ["http://example.com"]}


def test_attribs():
    # reference: test_html_parser.py:630-665
    html = (
        "<html><body>"
        "<h1>this is a title that we keep</h1>"
        '<div class="div-level-1">blablabla<div class="div-level-2">tidi tidi</div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(html)
    assert plain_text == "this is a title that we keep\nblablabla\ntidi tidi\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 4
    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla\ntidi tidi\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": [], "values": []})],
            "div": [
                ("blablabla\ntidi tidi\n", {"attrs": ["class"], "values": ["div-level-1"]}),
                ("\ntidi tidi", {"attrs": ["class"], "values": ["div-level-2"]}),
            ],
        },
        tags, metadata, plain_text,
    )


def test_remove_consecutive_tag():
    # reference: test_html_parser.py:668-709
    html = (
        "<html><body>"
        "<h1>this is a title that we keep</h1>"
        '<div class="div-level-1" id=1>blablabla<div class="div-level-2" href="http">tidi tidi</div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(html, consecutive_tags_to_fold=["div"])
    assert plain_text == "this is a title that we keep\nblablabla\ntidi tidi\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 3
    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla\ntidi tidi\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": [], "values": []})],
            "div": [
                (
                    "blablabla\ntidi tidi\n",
                    {"attrs": ["class", "id", "href"],
                     "values": ["div-level-1 div-level-2", "1", "http"]},
                ),
            ],
        },
        tags, metadata, plain_text,
    )


def test_remove_consecutive_tag_with_tag_to_remove():
    # reference: test_html_parser.py:712-758
    html = (
        "<html><body>"
        "<h1 id=title>this is a title that we keep</h1>"
        '<div class="div-level-1" id=1>blablabla<div class="div-level-2" href="http">tidi <span>tidi</span></div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(
        html,
        consecutive_tags_to_fold=["div"],
        tags_to_remove_alone=[TagToRemove("span")],
    )
    assert plain_text == "this is a title that we keep\nblablabla\ntidi tidi\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 3
    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla\ntidi tidi\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": ["id"], "values": ["title"]})],
            "div": [
                (
                    "blablabla\ntidi tidi\n",
                    {"attrs": ["class", "id", "href"],
                     "values": ["div-level-1 div-level-2", "1", "http"]},
                ),
            ],
        },
        tags, metadata, plain_text,
    )


def test_remove_consecutive_tag_very_nested():
    # reference: test_html_parser.py:761-809
    html = (
        "<html><body>"
        "<h1 id=title>this is a title that we keep</h1>"
        '<div class="div-level-1" id=1>blablabla<div class="div-level-2" href="http">tidi <div id=3>tidi2</div></div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(
        html,
        consecutive_tags_to_fold=["div"],
        tags_to_remove_alone=[TagToRemove("span")],
    )
    assert plain_text == "this is a title that we keep\nblablabla\ntidi\ntidi2\n"
    tags = [s.value for s in metadata]
    assert len(metadata) == 3
    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla\ntidi\ntidi2\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": ["id"], "values": ["title"]})],
            "div": [
                (
                    "blablabla\ntidi\ntidi2\n",
                    {"attrs": ["class", "id", "href"],
                     "values": ["div-level-1 div-level-2", "1 3", "http"]},
                ),
            ],
        },
        tags, metadata, plain_text,
    )


def test_min_len_to_include_tag():
    # reference: test_html_parser.py:812-865
    html = (
        "<html><body>"
        "<h1 id=title>this is a title that we keep</h1>"
        '<div class="div-level-1" id=1>blablabla<div class="div-level-2" href="http">tidi <span id=3>tidi2</span> <span id=3>this one keep his tag</span></div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(
        html,
        consecutive_tags_to_fold=["div"],
        tags_to_remove_alone=[TagToRemove("span", content_max_char_length=5)],
    )
    assert plain_text == (
        "this is a title that we keep\nblablabla\ntidi tidi2 this one keep his tag\n"
    )
    tags = [s.value for s in metadata]
    assert len(metadata) == 4
    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla\ntidi tidi2 this one keep his tag\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": ["id"], "values": ["title"]})],
            "div": [
                (
                    "blablabla\ntidi tidi2 this one keep his tag\n",
                    {"attrs": ["class", "id", "href"],
                     "values": ["div-level-1 div-level-2", "1", "http"]},
                ),
            ],
            "span": [("this one keep his tag", {"attrs": ["id"], "values": ["3"]})],
        },
        tags, metadata, plain_text,
    )


def test_idx_order():
    # reference: test_html_parser.py:999-1120 (the effective test_idx_order —
    # it shadows the earlier one at :868; both variants are kept here)
    html = (
        "<html><body>"
        "<h1 id=title>this is a title that we keep</h1>"
        '<br></br><div class="div-level-1" id=1><div class="div-level-2" href="http"><div class="div-level-3"><br> blablabla tidi <span id=3>tidi2</span></div><span id=2>this one keep his tag</span></div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(html)
    tags = [s.value for s in metadata]

    start_idx = defaultdict(dict)
    end_idx = defaultdict(dict)
    for s in metadata:
        start_idx[s.char_start_idx][s.relative_start_pos] = (s.value, attrs_dict(s))
        end_idx[s.char_end_idx][s.relative_end_pos] = (s.value, attrs_dict(s))

    assert dict(start_idx) == {
        0: {
            0: ("body", {"attrs": [], "values": []}),
            1: ("h1", {"attrs": ["id"], "values": ["title"]}),
        },
        29: {
            0: ("br", {"attrs": [], "values": []}),
            2: ("div", {"attrs": ["class", "id"], "values": ["div-level-1", "1"]}),
            3: ("div", {"attrs": ["class", "href"], "values": ["div-level-2", "http"]}),
            4: ("div", {"attrs": ["class"], "values": ["div-level-3"]}),
            5: ("br", {"attrs": [], "values": []}),
        },
        44: {0: ("span", {"attrs": ["id"], "values": ["3"]})},
        50: {0: ("span", {"attrs": ["id"], "values": ["2"]})},
    }
    assert dict(end_idx) == {
        28: {0: ("h1", {"attrs": ["id"], "values": ["title"]})},
        29: {
            1: ("br", {"attrs": [], "values": []}),
            6: ("br", {"attrs": [], "values": []}),
        },
        49: {
            0: ("span", {"attrs": ["id"], "values": ["3"]}),
            1: ("div", {"attrs": ["class"], "values": ["div-level-3"]}),
        },
        71: {
            0: ("span", {"attrs": ["id"], "values": ["2"]}),
            1: ("div", {"attrs": ["class", "href"], "values": ["div-level-2", "http"]}),
        },
        72: {
            0: ("div", {"attrs": ["class", "id"], "values": ["div-level-1", "1"]}),
            1: ("body", {"attrs": [], "values": []}),
        },
    }

    check_content_parsing_and_metadata(
        {
            "body": [
                ("this is a title that we keep\nblablabla tidi tidi2\nthis one keep his tag\n",
                 {"attrs": [], "values": []})
            ],
            "h1": [("this is a title that we keep", {"attrs": ["id"], "values": ["title"]})],
            "div": [
                ("blablabla tidi tidi2\nthis one keep his tag",
                 {"attrs": ["class", "href"], "values": ["div-level-2", "http"]}),
                ("blablabla tidi tidi2", {"attrs": ["class"], "values": ["div-level-3"]}),
                ("blablabla tidi tidi2\nthis one keep his tag\n",
                 {"attrs": ["class", "id"], "values": ["div-level-1", "1"]}),
            ],
            "span": [
                ("this one keep his tag", {"attrs": ["id"], "values": ["2"]}),
                ("tidi2", {"attrs": ["id"], "values": ["3"]}),
            ],
            "br": [("", {"attrs": [], "values": []}), ("", {"attrs": [], "values": []})],
        },
        tags, metadata, plain_text,
    )


def test_idx_order_no_br_variant():
    # reference: test_html_parser.py:868-996 (shadowed in the reference by
    # the second test_idx_order; preserved here because its assertions on
    # sorted relative positions are strictly stronger on the no-br input)
    html = (
        "<html><body>"
        "<h1 id=title>this is a title that we keep</h1>"
        '<div class="div-level-1" id=1><div class="div-level-2" href="http"><div class="div-level-3"> blablabla tidi <span id=3>tidi2</span></div><span id=2>this one keep his tag</span></div></div>'
        "</body></html>"
    )
    plain_text, metadata = run(html)
    tags = [s.value for s in metadata]

    by_start = defaultdict(dict)
    by_end = defaultdict(dict)
    for s in metadata:
        by_start[s.char_start_idx][s.relative_start_pos] = s
        by_end[s.char_end_idx][s.relative_end_pos] = s
    start_simple = {
        k: [(v[p].value, attrs_dict(v[p])) for p in sorted(v)] for k, v in by_start.items()
    }
    end_simple = {
        k: [(v[p].value, attrs_dict(v[p])) for p in sorted(v)] for k, v in by_end.items()
    }

    assert start_simple == {
        0: [
            ("body", {"attrs": [], "values": []}),
            ("h1", {"attrs": ["id"], "values": ["title"]}),
        ],
        29: [
            ("div", {"attrs": ["class", "id"], "values": ["div-level-1", "1"]}),
            ("div", {"attrs": ["class", "href"], "values": ["div-level-2", "http"]}),
            ("div", {"attrs": ["class"], "values": ["div-level-3"]}),
        ],
        44: [("span", {"attrs": ["id"], "values": ["3"]})],
        50: [("span", {"attrs": ["id"], "values": ["2"]})],
    }
    assert end_simple == {
        28: [("h1", {"attrs": ["id"], "values": ["title"]})],
        49: [
            ("span", {"attrs": ["id"], "values": ["3"]}),
            ("div", {"attrs": ["class"], "values": ["div-level-3"]}),
        ],
        71: [
            ("span", {"attrs": ["id"], "values": ["2"]}),
            ("div", {"attrs": ["class", "href"], "values": ["div-level-2", "http"]}),
        ],
        72: [
            ("div", {"attrs": ["class", "id"], "values": ["div-level-1", "1"]}),
            ("body", {"attrs": [], "values": []}),
        ],
    }


def test_convert_br_tag():
    # reference: test_html_parser.py:1123-1150
    html = "<html><body>first line<br>second line</body></html>"
    plain_text, metadata = run(html, convert_br_tag_to_breaking_line=True)
    assert plain_text == "first line\nsecond line\n"
    assert "br" not in [s.value for s in metadata]

    html = "<html><body>first line<br><br><br>second line</body></html>"
    plain_text, metadata = run(html, convert_br_tag_to_breaking_line=True)
    assert plain_text == "first line\n\n\nsecond line\n"
    assert "br" not in [s.value for s in metadata]

    plain_text, metadata = run(html)
    assert plain_text == "first line\nsecond line\n"
    assert "br" in [s.value for s in metadata]

    html = "<html><body>first line<br />second line</body></html>"
    plain_text, metadata = run(html, convert_br_tag_to_breaking_line=True)
    assert plain_text == "first line\nsecond line\n"
    assert "br" not in [s.value for s in metadata]


def test_toy_webpage_span_dicts():
    # reference: parse_scripts/test_parse_natural_questions.py:17-39
    html = "<html><body><div><p><a class=1, id=2></a>test</p></div></body></html>"
    plain_text, metadata = run(html)
    assert plain_text == "test\n"
    expected = [
        {"key": "html", "type": "local", "char_start_idx": 0, "relative_start_pos": 3,
         "char_end_idx": 0, "relative_end_pos": 4, "value": "a",
         "html_attrs": {"attrs": ["class", "id"], "values": ["1,", "2"]}},
        {"key": "html", "type": "local", "char_start_idx": 0, "relative_start_pos": 2,
         "char_end_idx": 4, "relative_end_pos": 0, "value": "p",
         "html_attrs": {"attrs": [], "values": []}},
        {"key": "html", "type": "local", "char_start_idx": 0, "relative_start_pos": 1,
         "char_end_idx": 5, "relative_end_pos": 0, "value": "div",
         "html_attrs": {"attrs": [], "values": []}},
        {"key": "html", "type": "local", "char_start_idx": 0, "relative_start_pos": 0,
         "char_end_idx": 5, "relative_end_pos": 1, "value": "body",
         "html_attrs": {"attrs": [], "values": []}},
    ]
    got = [
        {"key": s.key, "type": s.type, "char_start_idx": s.char_start_idx,
         "relative_start_pos": s.relative_start_pos, "char_end_idx": s.char_end_idx,
         "relative_end_pos": s.relative_end_pos, "value": s.value,
         "html_attrs": attrs_dict(s)}
        for s in metadata
    ]
    for g in got:
        expected.remove(g)
    assert expected == []


def test_invalid_removal_method_raises():
    # reference: html_parser.py:185-192
    with pytest.raises(ValueError):
        run("<html><body>x</body></html>",
            tags_to_remove_with_content=[TagToRemoveWithContent(tag="div", method="sideways")])
