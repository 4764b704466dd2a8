"""Property-based invariants for the CSS DOM engine (plans/cssdom.py):
random well-formed trees, cross-checked against structural definitions the
selector engine must satisfy regardless of input shape."""

from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_spark.plans.cssdom import find_all, parse_dom, select, select_one

TAGS = ["div", "span", "p", "li", "a", "b", "i", "section"]
CLASSES = ["x", "y", "z", "row"]


@st.composite
def html_tree(draw, depth=0):
    tag = draw(st.sampled_from(TAGS))
    cls = draw(st.one_of(st.none(), st.sampled_from(CLASSES)))
    attr = f' class="{cls}"' if cls else ""
    if depth >= 3:
        kids = [draw(st.text(alphabet="abc ", max_size=5))]
    else:
        kids = draw(
            st.lists(
                st.one_of(
                    st.text(alphabet="abc ", max_size=5),
                    html_tree(depth=depth + 1),
                ),
                max_size=3,
            )
        )
    return f"<{tag}{attr}>" + "".join(kids) + f"</{tag}>"


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_tag_select_equals_find_all(html):
    root = parse_dom(html)
    for tag in TAGS:
        assert select(root, tag) == find_all(root, [tag])


@settings(max_examples=60, deadline=None)
@given(html_tree(), st.sampled_from(TAGS + [f".{c}" for c in CLASSES]))
def test_select_one_is_first_of_select(html, sel):
    root = parse_dom(html)
    matches = select(root, sel)
    assert select_one(root, sel) == (matches[0] if matches else None)


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_select_document_order_and_containment(html):
    root = parse_dom(html)
    order = {id(el): i for i, el in enumerate(root.iter_elements())}
    for sel in ("div", ".x", "span", "div span", "p > b"):
        got = select(root, sel)
        idxs = [order[id(e)] for e in got]
        assert idxs == sorted(idxs)                 # document order
        assert all(id(e) in order for e in got)     # strict descendants


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_descendant_combinator_is_ancestor_filter(html):
    """'a b' ≡ {b-matches with an ancestor matching a} — checked against a
    brute-force reimplementation."""
    root = parse_dom(html)
    want = []
    for el in root.iter_elements():
        if el.tag != "span":
            continue
        p = el.parent
        while p is not None and p.tag != "[document]":
            if p.tag == "div":
                want.append(el)
                break
            p = p.parent
    assert select(root, "div span") == want


@settings(max_examples=60, deadline=None)
@given(html_tree())
def test_nth_child_partitions_children(html):
    """Every element is :nth-child(k) for exactly its 1-based index among
    element siblings; first-child ≡ nth-child(1)."""
    root = parse_dom(html)
    assert select(root, "*:first-child") == select(root, "*:nth-child(1)")
    for el in root.iter_elements():
        sibs = el.parent.element_children()
        k = sibs.index(el) + 1
        assert el in select(el.parent if el.parent.tag != "[document]" else root,
                            f"*:nth-child({k})") or el.parent.tag == "[document]"


@settings(max_examples=40, deadline=None)
@given(html_tree())
def test_get_text_concatenates_descendant_text(html):
    """get_text() equals the concatenation of all descendant text nodes in
    document order (strip=False)."""
    root = parse_dom(html)

    def walk(el):
        out = []
        for c in el.children:
            out.append(c if isinstance(c, str) else walk(c))
        return "".join(out)

    for el in root.iter_elements():
        assert el.get_text() == walk(el)
