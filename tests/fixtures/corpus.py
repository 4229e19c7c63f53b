"""Parity fixture corpus — template + page pairs with golden outputs
(FIXTURES.md §1; mirrors the reference's own pytest corpus shape:
template + page pairs with golden dict outputs, BASELINE.json:6).

One fixture per marker (SURVEY.md §3A A4–A13) plus the A6
greedy-alignment edge cases. ``expected`` is the golden captured dict
(None for mismatch cases); ``expected_status`` uses the engine's
status-row mapping of the A13 error taxonomy; ``expected_text`` is the
byte-identical-text contract value produced by ``enginelib.extract``.

NOTE /root/reference was empty at survey time (SURVEY.md §0) — these
goldens pin OUR engine's semantics, hand-derived from the documented
reference behavior; if the reference tree appears later, re-verify
side-by-side (Build Plan step 0).
"""

FIXTURES = [
    dict(
        fixture_id="name_basic",
        template='<html><body><h1 wp-name="title">X</h1><p wp-name="text">Y</p></body></html>',
        page='<html><body><h1>Hello World</h1><p>Main content.</p></body></html>',
        expected={"title": "Hello World", "text": "Main content."},
        expected_status="ok",
        expected_text="Main content.",
    ),
    dict(
        fixture_id="attrs_capture",
        template='<div class="card" wp-name-attrs="meta" wp-ignore-content></div>',
        page='<div class="card" data-id="42"><span>junk</span></div>',
        expected={"meta": {"class": "card", "data-id": "42"}},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="list_greedy",
        template='<ul><li wp-list wp-name="items">x</li></ul>',
        page='<ul><li>a</li><li>b</li><li>c</li></ul>',
        expected={"items": ["a", "b", "c"]},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="list_empty",
        template='<ul><li wp-list wp-name="items">x</li></ul>',
        page='<ul></ul>',
        expected={"items": []},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="list_nested",
        template='<ul><li wp-list wp-name="rows"><span wp-name="k">x</span><em wp-name="v">y</em></li></ul>',
        page='<ul><li><span>a</span><em>1</em></li><li><span>b</span><em>2</em></li></ul>',
        expected={"rows": [{"k": "a", "v": "1"}, {"k": "b", "v": "2"}]},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="list_distinct_sibling",
        template='<ul><li class="item" wp-list wp-name="items">x</li>'
                 '<li class="last" wp-name="last">y</li></ul>',
        page='<ul><li class="item">a</li><li class="item">b</li>'
             '<li class="last">z</li></ul>',
        expected={"items": ["a", "b"], "last": "z"},
        expected_status="ok",
        expected_text="z",
    ),
    dict(
        # A6 greedy invariant (SURVEY §4.3): the wp-list head-matches the
        # final plain <li> too (template-subset attrs), consumes it, and
        # the required class="last" sibling is then missing. Failure
        # parity: this MUST mismatch, not backtrack.
        fixture_id="list_greedy_eats_sibling",
        template='<ul><li wp-list wp-name="items">x</li>'
                 '<li class="last" wp-name="last">y</li></ul>',
        page='<ul><li>a</li><li>b</li><li class="last">z</li></ul>',
        expected=None,
        expected_status="mismatch:MissingNodeError",
        expected_text=None,
    ),
    dict(
        fixture_id="optional_present",
        template='<div><h1 wp-name="t">x</h1><p wp-optional wp-name="sub">y</p>'
                 '<span>end</span></div>',
        page='<div><h1>A</h1><p>B</p><span>end</span></div>',
        expected={"t": "A", "sub": "B"},
        expected_status="ok",
        expected_text="A\nB",
    ),
    dict(
        fixture_id="optional_absent",
        template='<div><h1 wp-name="t">x</h1><p wp-optional wp-name="sub">y</p>'
                 '<span>end</span></div>',
        page='<div><h1>A</h1><span>end</span></div>',
        expected={"t": "A"},
        expected_status="ok",
        expected_text="A",
    ),
    dict(
        fixture_id="nested_optional_list_present",
        template='<div><ul wp-optional><li wp-list wp-name="tags">x</li></ul>'
                 '<p wp-name="c">x</p></div>',
        page='<div><ul><li>t1</li><li>t2</li></ul><p>C</p></div>',
        expected={"tags": ["t1", "t2"], "c": "C"},
        expected_status="ok",
        expected_text="C",
    ),
    dict(
        fixture_id="nested_optional_list_absent",
        template='<div><ul wp-optional><li wp-list wp-name="tags">x</li></ul>'
                 '<p wp-name="c">x</p></div>',
        page='<div><p>C</p></div>',
        expected={"c": "C"},
        expected_status="ok",
        expected_text="C",
    ),
    dict(
        fixture_id="ignore_tail",
        template='<div><h1 wp-name="t">x</h1><wp-ignore/></div>',
        page='<div><h1>A</h1><p>junk</p><p>more junk</p></div>',
        expected={"t": "A"},
        expected_status="ok",
        expected_text="A",
    ),
    dict(
        fixture_id="ignore_middle",
        template='<div><wp-ignore/><p wp-name="c">x</p></div>',
        page='<div><nav>n</nav><aside>a</aside><p>C</p></div>',
        expected={"c": "C"},
        expected_status="ok",
        expected_text="C",
    ),
    dict(
        fixture_id="ignore_until",
        template='<div><wp-ignore wp-until="footer"/>'
                 '<footer wp-name-attrs="f" wp-ignore-content></footer></div>',
        page='<div><p>x</p><span>y</span><footer id="ft"><b>z</b></footer></div>',
        expected={"f": {"id": "ft"}},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="recursive_subtree",
        template='<div><article wp-recursive wp-name="body">x</article></div>',
        page='<div><article><p>One</p><p>Two <b>bold</b></p></article></div>',
        expected={"body": "<article><p>One</p><p>Two <b>bold</b></p></article>"},
        expected_status="ok",
        expected_text="<article><p>One</p><p>Two <b>bold</b></p></article>",
    ),
    dict(
        fixture_id="nugget_mixed",
        template='<p><b>Price</b><wp-nugget wp-name="price"/><b>per</b></p>',
        page='<p><b>Price</b> $9.99 <b>per</b></p>',
        expected={"price": "$9.99"},
        expected_status="ok",
        expected_text="$9.99",
    ),
    dict(
        fixture_id="function_hook",
        template='<span wp-name="n" wp-function="to_int">x</span>',
        page='<span>42</span>',
        functions={"to_int": int},
        expected={"n": 42},
        expected_status="ok",
        expected_text="",  # int capture is not a scalar string → no text
    ),
    dict(
        fixture_id="ignore_attrs",
        template='<a wp-ignore-attrs wp-name="link">x</a>',
        page='<a href="/x" class="b">Click</a>',
        expected={"link": "Click"},
        expected_status="ok",
        expected_text="Click",
    ),
    dict(
        fixture_id="ignore_content",
        template='<div><script wp-ignore-content></script><p wp-name="c">x</p></div>',
        page='<div><script>var x = 1;</script><p>C</p></div>',
        expected={"c": "C"},
        expected_status="ok",
        expected_text="C",
    ),
    dict(
        # convert_charrefs=True: stdlib decodes entities before we see
        # them (SURVEY §8 risk register, verified behavior).
        fixture_id="entity_decode",
        template='<p wp-name="t">x</p>',
        page='<p>a&amp;b &#65;</p>',
        expected={"t": "a&b A"},
        expected_status="ok",
        expected_text="a&b A",
    ),
    dict(
        fixture_id="whitespace_dropped",
        template='<div>\n  <h1 wp-name="t">x</h1>\n</div>',
        page='<div>\n\n  <h1>A</h1>  \n</div>',
        expected={"t": "A"},
        expected_status="ok",
        expected_text="A",
    ),
    dict(
        fixture_id="void_elements",
        template='<div><h1 wp-name="t">x</h1><br><img src="a.png">'
                 '<p wp-name="c">y</p></div>',
        page='<div><h1>A</h1><br><img src="a.png"><p>C</p></div>',
        expected={"t": "A", "c": "C"},
        expected_status="ok",
        expected_text="A\nC",
    ),
    dict(
        fixture_id="err_tag_mismatch",
        template='<div><h1 wp-name="t">x</h1></div>',
        page='<div><h2>A</h2></div>',
        expected=None,
        expected_status="mismatch:TagError",
        expected_text=None,
    ),
    dict(
        fixture_id="err_missing_node",
        template='<div><h1 wp-name="t">x</h1><p>req</p></div>',
        page='<div><h1>A</h1></div>',
        expected=None,
        expected_status="mismatch:MissingNodeError",
        expected_text=None,
    ),
    dict(
        fixture_id="err_excess_node",
        template='<div><h1 wp-name="t">x</h1></div>',
        page='<div><h1>A</h1><p>extra</p></div>',
        expected=None,
        expected_status="mismatch:ExcessNodeError",
        expected_text=None,
    ),
    dict(
        fixture_id="err_nonatomic",
        template='<div wp-name="t">x</div>',
        page='<div><b>A</b></div>',
        expected=None,
        expected_status="mismatch:NonAtomicChildError",
        expected_text=None,
    ),
    dict(
        # r04 probe: an EMPTY capture element (no text children at
        # all) is the same structural mismatch as a tag child —
        # wp-name requires exactly one text child, "" is not captured
        fixture_id="err_nonatomic_empty",
        template='<div wp-name="t">x</div>',
        page='<div>   \n  </div>',
        expected=None,
        expected_status="mismatch:NonAtomicChildError",
        expected_text=None,
    ),
    dict(
        # r04 probe: CDATA sections and other declarations are
        # DROPPED by the tolerant parser (same as comments), so a
        # capture div holding only <![CDATA[...]]> is the empty case
        fixture_id="err_nonatomic_cdata",
        template='<div wp-name="t">x</div>',
        page='<div><![CDATA[raw]]></div>',
        expected=None,
        expected_status="mismatch:NonAtomicChildError",
        expected_text=None,
    ),
    dict(
        # r04 probe: comments inside a capture element are invisible
        # — the remaining single text child captures normally
        fixture_id="comment_invisible_in_capture",
        template='<div wp-name="t">x</div>',
        page='<div><!-- note -->Hello</div>',
        expected={"t": "Hello"},
        expected_status="ok",
        expected_text="Hello",
    ),
    dict(
        # r04 probe: tag/attr names are case-insensitive (HTMLParser
        # lowercases both sides) — a <DIV CLASS=…> template matches a
        # <div class=…> page
        fixture_id="case_insensitive_tags_attrs",
        template='<DIV CLASS="a" wp-name="t">x</DIV>',
        page='<div class="a">Hi</div>',
        expected={"t": "Hi"},
        expected_status="ok",
        expected_text="Hi",
    ),
    dict(
        # r04 probe: character references decode before capture
        # (convert_charrefs) — entities and numeric refs come back as
        # their characters, byte-identically
        fixture_id="entities_decode_in_capture",
        template='<p wp-name="t">x</p>',
        page='<p>a &amp; b &lt;c&gt; &#233;</p>',
        expected={"t": "a & b <c> é"},
        expected_status="ok",
        expected_text="a & b <c> é",
    ),
    dict(
        fixture_id="err_attrs",
        template='<div class="main"><p wp-name="c">x</p></div>',
        page='<div class="other"><p>C</p></div>',
        expected=None,
        expected_status="mismatch:AttrsError",
        expected_text=None,
    ),
    dict(
        fixture_id="err_text_literal",
        template='<div><h2>Header</h2><p wp-name="c">x</p></div>',
        page='<div><h2>Wrong</h2><p>C</p></div>',
        expected=None,
        expected_status="mismatch:TextError",
        expected_text=None,
    ),
    # ---- r03 depth fixtures: wp-until / wp-name-attrs edges (the two
    # §3A markers flagged LOW-CONFIDENCE in SURVEY — these pin OUR
    # semantics precisely until the reference tree appears) ----------------
    dict(
        fixture_id="until_stops_at_first_occurrence",
        template='<div><wp-ignore wp-until="p"/><p wp-name="x">t</p></div>',
        page='<div><span>j1</span><nav>j2</nav><p>first</p><p>second</p></div>',
        expected=None,
        expected_status="mismatch:ExcessNodeError",
        expected_text=None,
    ),
    dict(
        fixture_id="until_target_never_appears",
        template='<div><wp-ignore wp-until="footer"/>'
                 '<footer wp-name="f">t</footer></div>',
        page='<div><span>junk</span></div>',
        expected=None,
        expected_status="mismatch:MissingNodeError",
        expected_text=None,
    ),
    dict(
        fixture_id="until_immediately_satisfied",
        template='<div><wp-ignore wp-until="p"/><p wp-name="x">t</p></div>',
        page='<div><p>only</p></div>',
        expected={"x": "only"},
        expected_status="ok",
        expected_text="only",
    ),
    dict(
        fixture_id="attrs_capture_empty_attrs",
        template='<div wp-name-attrs="m" wp-ignore-content></div>',
        page='<div><span>c</span></div>',
        expected={"m": {}},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="attrs_and_text_capture_same_node",
        template='<div wp-name-attrs="m" wp-name="t">x</div>',
        page='<div id="7">content</div>',
        expected={"m": {"id": "7"}, "t": "content"},
        expected_status="ok",
        expected_text="content",
    ),
    dict(
        fixture_id="list_item_own_attrs_capture",
        # an attrs capture on the list item itself must never be
        # silently dropped: items become per-item dicts
        template='<ul><li wp-list wp-name="items" wp-name-attrs="a">x</li></ul>',
        page='<ul><li id="1">a</li><li id="2">b</li></ul>',
        expected={"items": [{"a": {"id": "1"}, "items": "a"},
                            {"a": {"id": "2"}, "items": "b"}]},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="until_then_attrs_capture",
        template='<div><wp-ignore wp-until="footer"/>'
                 '<footer class="f" wp-name-attrs="fa" wp-ignore-content>'
                 '</footer></div>',
        page='<div><p>j</p><footer class="f" data-x="1"></footer></div>',
        expected={"fa": {"class": "f", "data-x": "1"}},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="nugget_after_until_ignore",
        template='<body><wp-ignore wp-until="b"/><b>Price</b>'
                 '<wp-nugget wp-name="p"/><b>USD</b></body>',
        page='<body><i>junk</i><b>Price</b> 12.50 <b>USD</b></body>',
        expected={"p": "12.50"},
        expected_status="ok",
        expected_text="12.50",
    ),
    dict(
        fixture_id="recursive_list_serializes_each_item",
        template='<div><section wp-list wp-recursive wp-name="blocks">x</section></div>',
        page='<div><section><p>a</p></section><section><b>b</b></section></div>',
        expected={"blocks": ["<section><p>a</p></section>",
                             "<section><b>b</b></section>"]},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="optional_list_zero_items",
        template='<ul><li wp-list wp-optional wp-name="xs">x</li></ul>',
        page='<ul></ul>',
        expected={"xs": []},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="function_attrs_hook",
        template='<div wp-name-attrs="m" wp-function-attrs="upper_keys" wp-ignore-content></div>',
        page='<div a="1"></div>',
        functions={"upper_keys": lambda d: {k.upper(): v
                                            for k, v in d.items()}},
        expected={"m": {"A": "1"}},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="optional_inside_list_items",
        # a missing optional capture OMITS the key in that item dict
        template='<ul><li wp-list wp-name="rows"><b wp-name="k">x</b>'
                 '<i wp-optional wp-name="v">y</i></li></ul>',
        page='<ul><li><b>a</b><i>1</i></li><li><b>b</b></li></ul>',
        expected={"rows": [{"k": "a", "v": "1"}, {"k": "b"}]},
        expected_status="ok",
        expected_text="",
    ),
    dict(
        fixture_id="double_ignore_runs_merge",
        template='<div><wp-ignore/><wp-ignore/><p wp-name="x">t</p></div>',
        page='<div><a>j</a><b>k</b><p>v</p></div>',
        expected={"x": "v"},
        expected_status="ok",
        expected_text="v",
    ),
    dict(
        fixture_id="trailing_ignore_eats_page_tail",
        template='<div><p wp-name="x">t</p><wp-ignore/></div>',
        page='<div><p>v</p><a>j1</a><b>j2</b></div>',
        expected={"x": "v"},
        expected_status="ok",
        expected_text="v",
    ),
    dict(
        fixture_id="text_literal_whitespace_normalized",
        template='<div><b>Label</b><p wp-name="x">t</p></div>',
        page='<div><b>  Label  </b><p>v</p></div>',
        expected={"x": "v"},
        expected_status="ok",
        expected_text="v",
    ),
]
