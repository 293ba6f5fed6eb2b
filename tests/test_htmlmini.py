"""jsoup-compatibility tests for the stdlib DOM (extractors/htmlmini.py)."""

from dmp_crawler_spark.extractors.htmlmini import jsoup_text, parse


def test_text_whitespace_collapse():
    assert jsoup_text("<p>hello   \n  world</p>") == "hello world"


def test_text_block_boundaries():
    # jsoup: block boundary becomes exactly one space, inline tags none
    assert jsoup_text("<div>a</div><div>b</div>") == "a b"
    assert jsoup_text("<span>a</span><span>b</span>") == "ab"
    assert jsoup_text("x<br>y") == "x y"


def test_text_excludes_script_and_style():
    assert jsoup_text("<p>a</p><script>var x=1;</script><p>b</p>") == "a b"
    assert jsoup_text("<style>.x{}</style><p>c</p>") == "c"


def test_text_trims():
    assert jsoup_text("  <p> padded </p>  ") == "padded"


def test_select_by_id_class_attr():
    root = parse(
        '<div id="a" class="x y"><p class="y" title="t">one</p>'
        '<p data-k="v">two</p></div>'
    )
    assert root.select_one("#a").attr("class") == "x y"
    assert [e.text() for e in root.select(".y")] == ["one two", "one"]
    assert root.select_one("p[title=t]").text() == "one"
    assert root.select_one("[data-k]").text() == "two"


def test_select_descendant_and_child():
    root = parse("<ul id='u'><li><a>deep</a></li></ul><a>shallow</a>")
    assert [e.text() for e in root.select("#u a")] == ["deep"]
    assert [e.text() for e in root.select("ul > li > a")] == ["deep"]
    assert len(root.select("a")) == 2


def test_own_text_and_sibling():
    root = parse("<div>own <b>bold</b> tail</div>")
    d = root.select_one("div")
    assert d.own_text() == "own tail"
    assert d.text() == "own bold tail"


def test_elements_containing_own_text():
    root = parse("<p>alpha</p><p>beta</p>")
    els = root.elements_containing_own_text("bet")
    assert len(els) == 1 and els[0].text() == "beta"
