"""X9 CSS-selector extraction (generic_scraper.py:140-247) + malformed-HTML
recovery contract (FIXTURES.md). Selector grammar under test is exactly the
set used by the reference's shipped configs (settings.yaml:116-176,
example_generic.yaml:44-90)."""

from web_crawler_spark.plans.cssdom import (
    find_all,
    parse_dom,
    select,
    select_one,
)
from web_crawler_spark.plans.extract import (
    css_config_stage,
    extract_config_items,
    parse_html,
)

YAHOO_HTML = """
<html><body>
<table id="main">
 <tbody>
 <tr data-symbol="GC" class="row odd"><td aria-label='Symbol'><a href="/gc">Gold</a></td><td aria-label='Last Price'><span> 2,345.60 </span></td><td aria-label='Change'><span>+1.2%</span></td><td><span>x</span></td></tr>
 <tr class="row even"><td><a href="/si">Silver</a></td><td><span>29.10</span></td><td><span>-0.4%</span></td><td><span>y</span></td></tr>
 </tbody>
</table>
<div class="commodity-row"><span class="commodity-name">Oil &amp; Gas</span><span class="commodity-price">$78.20</span></div>
</body></html>
"""


def test_selector_grammar_reference_configs():
    """Every selector shape the reference ships resolves correctly."""
    root = parse_dom(YAHOO_HTML)
    rows = select(root, "table tbody tr")          # example_generic.yaml:45
    assert len(rows) == 2
    r0 = rows[0]
    # settings.yaml:120-126
    assert select_one(r0, "td[aria-label='Symbol'] a").get_text(strip=True) == "Gold"
    assert select_one(r0, "td[aria-label='Last Price']").get_text(strip=True) == "2,345.60"
    assert select_one(r0, "td[aria-label='Change']").get_text(strip=True) == "+1.2%"
    # example_generic.yaml:48-56
    assert select_one(r0, "td:first-child a").get("href") == "/gc"
    assert select_one(rows[1], "td:nth-child(2) span").get_text(strip=True) == "29.10"
    assert select_one(rows[1], "td:nth-child(3) span").get_text(strip=True) == "-0.4%"
    # settings.yaml:117 container
    assert select(root, "tr[data-symbol]") == [r0]
    # settings.yaml:174-176 class selectors
    d = select_one(root, ".commodity-row")
    assert select_one(d, ".commodity-name").get_text(strip=True) == "Oil & Gas"
    assert select_one(d, ".commodity-price").get_text(strip=True) == "$78.20"


def test_selector_extras():
    root = parse_dom(YAHOO_HTML)
    assert select_one(root, "tr.row.even td a").get("href") == "/si"
    assert select_one(root, "#main").tag == "table"
    assert select_one(root, "td > a").get_text() == "Gold"
    assert select_one(root, "td[aria-label^='Last']") is not None
    assert select_one(root, "td[aria-label$='Price']") is not None
    assert select_one(root, "td[aria-label*='ast P']") is not None
    assert len(select(root, "tr:nth-child(even)")) == 1
    assert select_one(root, "tr:last-child td:nth-child(4) span").get_text() == "y"
    # comma group: first match in document order across the union
    assert select(root, "a, span")[0].get_text(strip=True) == "Gold"
    # select_one miss → None (generic_scraper returns None for the field)
    assert select_one(root, ".does-not-exist") is None
    # default container scan (generic_scraper.py:152-153)
    assert [e.tag for e in find_all(root, ["tr", "div", "li"])] == ["tr", "tr", "div"]


def test_dom_recovery_implied_end_tags():
    """HTML5 implied-end-tag recovery: unclosed tr/td/li, stray end tags."""
    m = parse_dom(
        "<table><tr><td>a<td>b<tr><td>c</b><td>d</table><ul><li>1<li>2</ul>"
    )
    trs = select(m, "tr")
    assert len(trs) == 2
    assert [c.tag for c in trs[0].element_children()] == ["td", "td"]
    assert [td.get_text(strip=True) for td in select(m, "td")] == ["a", "b", "c", "d"]
    assert [li.get_text(strip=True) for li in select(m, "li")] == ["1", "2"]
    assert select_one(m, "tr:nth-child(2) td:first-child").get_text() == "c"


def test_dom_recovery_nested_table_scope():
    """Implied closes stop at the <table> scope boundary: a nested table's
    <tr> must NOT close the outer row."""
    m = parse_dom("<table><tr><td>x<table><tr><td>i</table><td>y</table>")
    outer_tr = select(m, "tr")[0]
    tds = [c for c in outer_tr.element_children() if c.tag == "td"]
    assert len(tds) == 2  # 'x...' cell (containing inner table) + 'y' cell
    assert tds[1].get_text(strip=True) == "y"


def test_table_parser_recovery_matches_dom():
    """The streaming _TableParser applies the same implied-end rules."""
    p = parse_html("<table><tr><td>a<td>b<tr><td>c<td>d</table>")
    assert p.tables == [[["a", "b"], ["c", "d"]]]
    # nested + malformed: inner rows belong to both tables, outer cell keeps
    # collecting through the inner table (lxml-style recovery)
    p2 = parse_html("<table><tr><td>x<table><tr><td>i1<td>i2</table><tr><td>y</table>")
    assert p2.tables[1] == [["i1", "i2"]]
    assert p2.tables[0] == [["xi1i2"], ["i1", "i2"], ["y"]]


def test_extract_config_items_full_rule_set():
    """generic_scraper._extract_field_value paths: str rule, selector miss,
    attribute pull, regex group, transform chain, required-field drop."""
    html = (
        "<table><tbody>"
        "<tr><td><a href='/gc'>Gold</a></td><td><span>$2,391.20</span></td>"
        "<td><span>+1.2%</span></td></tr>"
        "<tr><td><a href='/ag'>Silver</a></td><td><span>$29.10</span></td>"
        "<td></td></tr>"
        "<tr><td></td><td><span>$1.00</span></td><td><span>0%</span></td></tr>"
        "</tbody></table>"
    )
    items = extract_config_items(
        html,
        {
            "container": "table tbody tr",
            "fields": {
                "name": {"selector": "td:first-child a", "transform": "uppercase"},
                "link": {"selector": "td a", "attribute": "href"},
                "price": {
                    "selector": "td:nth-child(2) span",
                    "regex": r"\$([\d,\.]+)",
                    "transform": "float",
                },
                "change": "td:nth-child(3) span",   # plain-string rule
            },
        },
    )
    # row 3 drops: no name (required default ['name'], generic_scraper.py:179);
    # row 2's change element is empty → get_text '' → falsy → field absent
    assert items == [
        {"name": "GOLD", "link": "/gc", "price": "2391.20", "change": "+1.2%"},
        {"name": "SILVER", "link": "/ag", "price": "29.10"},
    ]


def test_extract_config_no_selector_regex_on_container():
    """dict rule without selector applies regex/transform to the container's
    own text (generic_scraper.py:208-209)."""
    items = extract_config_items(
        "<div class='q'>bid 1,250.5 usd</div>",
        {
            "container": ".q",
            "fields": {
                "name": {"regex": r"^(\w+)"},
                "val": {"regex": r"([\d,\.]+)", "transform": "float"},
            },
        },
    )
    assert items == [{"name": "bid", "val": "1250.5"}]


def test_css_config_stage_spark(spark):
    """End-to-end mapInPandas stage + SourceRegistry html path with native
    cleaning/validation downstream."""
    from pyspark.sql import functions as F

    from web_crawler_spark.plans.dsl import SourceRegistry

    pages = spark.createDataFrame(
        [
            ("http://x/1", YAHOO_HTML.encode()),
            ("http://x/2", b"<table><tr><td>no anchor</td></tr></table>"),
        ],
        "url string, html binary",
    )
    config = {
        "parser": "html",
        "extraction": {
            "container": "table tbody tr",
            "fields": {
                "name": {"selector": "td:first-child a", "transform": "uppercase"},
                "price": {"selector": "td:nth-child(2) span", "transform": "float"},
                "change": "td:nth-child(3) span",
            },
        },
        "cleaning": {"fields": {"price": "remove_currency"}},
        "validation": {"required_fields": ["name", "price"], "formats": {"price": "number"}},
    }
    reg = SourceRegistry()
    reg.register("yahoo", config)
    out = reg.build("yahoo")(pages).orderBy("name").collect()
    assert [(r.name, r.price, r.change) for r in out] == [
        ("GOLD", "2345.60", "+1.2%"),
        ("SILVER", "29.10", "-0.4%"),
    ]
