"""Lightweight DOM + CSS-selector engine for the X9 config-driven HTML path.

The reference's generic_scraper resolves field rules with BeautifulSoup CSS
selection (pacong/scrapers/generic_scraper.py:149-229): ``soup.select(
container)`` picks item containers, ``container.select_one(selector)`` picks
the field element (first match in document order), ``element.get(attribute)``
pulls an attribute else ``get_text(strip=True)``. This container has no
bs4/soupsieve, so the engine implements the subset of CSS used by the
reference's shipped configs (settings.yaml:116-176, example_generic.yaml:
44-90) on a stdlib ``html.parser`` tree:

  tag, ``*``, ``.class``, ``#id``, ``[attr]``, ``[attr=v]`` (plus ``^= $= *=
  ~=``), ``:first-child``, ``:last-child``, ``:nth-child(An+B|k|even|odd)``,
  compound selectors, descendant / ``>`` child combinators, ``,`` groups.

Malformed-HTML recovery follows the HTML5 tree-construction implied-end-tag
rules (the behavior of bs4+lxml/html5lib on real crawl HTML): a new ``<tr>``
closes any open ``td/th/tr``, ``<td>/<th>`` close an open cell, ``<li>``
closes ``<li>``, ``<p>`` closes ``<p>``, section tags close open rows, and a
stray end tag pops to its nearest matching open tag (ignored if none).
Well-formed documents parse identically to the strict round-1 contract; the
recovery rules only engage on inputs the strict parser mis-nested. See
FIXTURES.md for the contract statement.

Pure Python, no Spark imports — runs inside mapInPandas Arrow batches
(plans/extract.py) where per-page Python is the only option; everything
around it stays JVM-side.
"""

from __future__ import annotations

import functools
import re
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# DOM
# ---------------------------------------------------------------------------

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# start of <tag> implicitly closes any run of these open tags above it
# (HTML5 "implied end tags"; scope boundaries like <table> are simply
# absent from the closer sets, so popping stops there naturally)
_IMPLIED_CLOSERS = {
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "p": {"p"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "thead": {"tr", "td", "th", "caption", "colgroup"},
    "tbody": {"tr", "td", "th", "thead", "caption", "colgroup"},
    "tfoot": {"tr", "td", "th", "tbody", "thead"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
    "table": {"p"},
}


class Element:
    """One DOM node. ``children`` holds Element and str (text) nodes."""

    __slots__ = ("tag", "attrs", "parent", "children")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Element | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[Element | str] = []

    # -- bs4-parity accessors ------------------------------------------------

    def get(self, name: str, default=None):
        """``element.get(attribute)`` (generic_scraper.py:213)."""
        return self.attrs.get(name, default)

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """``get_text(strip=True)``: descendant text chunks in document
        order; with strip, each chunk stripped and empties dropped."""
        order: list[str] = []

        def walk(el: Element) -> None:
            for c in el.children:
                if isinstance(c, str):
                    order.append(c)
                else:
                    walk(c)
        walk(self)
        if strip:
            chunks = [c.strip() for c in order if c.strip()]
        else:
            chunks = order
        return separator.join(chunks)

    def iter_elements(self):
        """Document-order (pre-order) descendant elements, self excluded."""
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter_elements()

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def __repr__(self) -> str:  # debugging aid only
        return f"<{self.tag} {self.attrs}>"


class _DomBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("[document]", {}, None)
        self._stack: list[Element] = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        closers = _IMPLIED_CLOSERS.get(tag)
        if closers:
            while len(self._stack) > 1 and self._stack[-1].tag in closers:
                self._stack.pop()
        amap: dict[str, str] = {}
        for k, v in attrs:
            if k not in amap:          # first occurrence wins (html spec)
                amap[k] = v if v is not None else ""
        el = Element(tag, amap, self._stack[-1])
        self._stack[-1].children.append(el)
        if tag not in _VOID:
            self._stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <tag/> — never pushed open regardless of voidness
        amap: dict[str, str] = {}
        for k, v in attrs:
            if k not in amap:
                amap[k] = v if v is not None else ""
        self._stack[-1].children.append(Element(tag, amap, self._stack[-1]))

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID:
            return
        # pop to nearest matching open tag; ignore stray end tags
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._stack[-1].children.append(data)


def parse_dom(html: str) -> Element:
    b = _DomBuilder()
    b.feed(html or "")
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# CSS selector engine
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
  | \.(?P<cls>[\w-]+)
  | \#(?P<id>[\w-]+)
  | \[(?P<aname>[\w-]+)\s*(?:(?P<aop>[~^$*|]?=)\s*
        (?P<aval>"[^"]*"|'[^']*'|[^\]\s]+))?\s*\]
  | :(?P<pseudo>[\w-]+)(?:\(\s*(?P<parg>[^)]*)\s*\))?
    """,
    re.VERBOSE,
)


class _Compound:
    __slots__ = ("tag", "classes", "id", "attrs", "pseudos")

    def __init__(self):
        self.tag: str | None = None
        self.classes: list[str] = []
        self.id: str | None = None
        self.attrs: list[tuple[str, str | None, str | None]] = []
        self.pseudos: list[tuple[str, str | None]] = []


def _parse_compound(text: str) -> _Compound:
    c = _Compound()
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ValueError(f"unsupported CSS selector fragment: {text[pos:]!r}")
        if m.group("tag"):
            c.tag = m.group("tag").lower()
        elif m.group("cls"):
            c.classes.append(m.group("cls"))
        elif m.group("id"):
            c.id = m.group("id")
        elif m.group("aname"):
            val = m.group("aval")
            if val is not None and val[:1] in "'\"":
                val = val[1:-1]
            c.attrs.append((m.group("aname").lower(), m.group("aop"), val))
        elif m.group("pseudo"):
            c.pseudos.append((m.group("pseudo").lower(), m.group("parg")))
        pos = m.end()
    return c


def _split_selector(selector: str) -> list[list[tuple[str, str]]]:
    """Bracket/quote-aware scan: 'a b > c, d' →
    [[(' ','a'),(' ','b'),('>','c')], [(' ','d')]]."""
    groups: list[list[tuple[str, str]]] = []
    chain: list[tuple[str, str]] = []
    buf: list[str] = []
    comb = " "
    depth = 0          # inside [...] or (...)
    quote: str | None = None

    def flush() -> None:
        nonlocal buf, comb
        if buf:
            chain.append((comb, "".join(buf)))
            buf = []
            comb = " "

    for ch in selector:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"" and depth:
            quote = ch
            buf.append(ch)
        elif ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif depth:
            buf.append(ch)
        elif ch == ",":
            flush()
            if chain:
                groups.append(chain)
                chain = []
        elif ch == ">":
            flush()
            comb = ">"
        elif ch.isspace():
            flush()
        else:
            buf.append(ch)
    flush()
    if chain:
        groups.append(chain)
    return groups


@functools.lru_cache(maxsize=1024)
def _parse_selector(selector: str) -> list[list[tuple[str, _Compound]]]:
    """Parsed-selector cache: config selectors are a handful of distinct
    strings applied to millions of pages — parsing once per executor
    instead of once per page/container matters in the mapInPandas loop."""
    groups = [
        [(comb, _parse_compound(tok)) for comb, tok in chain]
        for chain in _split_selector(selector)
    ]
    if not groups:
        raise ValueError(f"empty CSS selector: {selector!r}")
    return groups


_NTH_RE = re.compile(r"^(?:(even)|(odd)|(?:([+-]?\d*)n\s*([+-]\s*\d+)?)|([+-]?\d+))$")


def _nth_matches(index: int, arg: str) -> bool:
    """1-based *index* against An+B / k / even / odd."""
    m = _NTH_RE.match((arg or "").strip().lower().replace(" ", ""))
    if not m:
        return False
    if m.group(1):  # even
        return index % 2 == 0
    if m.group(2):  # odd
        return index % 2 == 1
    if m.group(5):  # plain integer
        return index == int(m.group(5))
    a_txt = m.group(3)
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = int(m.group(4).replace(" ", "")) if m.group(4) else 0
    if a == 0:
        return index == b
    k = (index - b) / a
    return k >= 0 and k == int(k)


def _matches_compound(el: Element, c: _Compound) -> bool:
    if c.tag and c.tag != "*" and el.tag != c.tag:
        return False
    if c.id is not None and el.attrs.get("id") != c.id:
        return False
    if c.classes:
        have = (el.attrs.get("class") or "").split()
        if any(cls not in have for cls in c.classes):
            return False
    for name, op, val in c.attrs:
        actual = el.attrs.get(name)
        if actual is None:
            return False
        if op is None:
            continue
        if op == "=" and actual != val:
            return False
        if op == "^=" and not actual.startswith(val):
            return False
        if op == "$=" and not actual.endswith(val):
            return False
        if op == "*=" and val not in actual:
            return False
        if op == "~=" and val not in actual.split():
            return False
        if op == "|=" and not (actual == val or actual.startswith(val + "-")):
            return False
    for name, arg in c.pseudos:
        parent = el.parent
        siblings = parent.element_children() if parent else [el]
        idx = siblings.index(el) + 1
        if name == "first-child":
            if idx != 1:
                return False
        elif name == "last-child":
            if idx != len(siblings):
                return False
        elif name == "nth-child":
            if not _nth_matches(idx, arg or ""):
                return False
        elif name == "nth-last-child":
            if not _nth_matches(len(siblings) - idx + 1, arg or ""):
                return False
        else:
            raise ValueError(f"unsupported CSS pseudo-class: :{name}")
    return True


def _matches_chain(el: Element, chain: list[tuple[str, _Compound]]) -> bool:
    """Right-to-left: el matches chain[-1][1]; the combinator stored with
    chain[-1] links it to chain[-2], matched against el's parent (``>``) or
    any ancestor (descendant). Like soupsieve, ancestor matching walks the
    whole tree — scope only restricts which elements are *candidates*."""
    if not _matches_compound(el, chain[-1][1]):
        return False
    rest = chain[:-1]
    if not rest:
        return True
    comb = chain[-1][0]
    if comb == ">":
        p = el.parent
        return p is not None and p.tag != "[document]" and _matches_chain(p, rest)
    p = el.parent
    while p is not None and p.tag != "[document]":
        if _matches_chain(p, rest):
            return True
        p = p.parent
    return False


def select(scope: Element, selector: str) -> list[Element]:
    """All descendant elements of *scope* matching *selector*, document
    order, like ``Tag.select``. The scope element itself never matches."""
    groups = _parse_selector(selector)
    out = []
    for el in scope.iter_elements():
        if any(_matches_chain(el, g) for g in groups):
            out.append(el)
    return out


def select_one(scope: Element, selector: str) -> Element | None:
    """First match in document order (``Tag.select_one``,
    generic_scraper.py:205)."""
    groups = _parse_selector(selector)
    for el in scope.iter_elements():
        if any(_matches_chain(el, g) for g in groups):
            return el
    return None


def find_all(scope: Element, names: list[str] | set[str]) -> list[Element]:
    """``soup.find_all(['tr','div','li'])`` — the reference's default
    container scan when no container selector is set (generic_scraper.py:
    152-153)."""
    names = set(names)
    return [el for el in scope.iter_elements() if el.tag in names]
