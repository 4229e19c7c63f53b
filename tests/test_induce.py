"""Template induction (C12, SURVEY.md §3C / Build Plan step 5): the
induced template must re-extract every one of its own samples with
status=ok and capture exactly the diverging texts."""

from weakscraper_spark.enginelib import induce_template
from weakscraper_spark.enginelib.match import extract


def _page(title, body, tags):
    lis = "".join(f"<li>{t}</li>" for t in tags)
    return (
        "<html><body>"
        "<h1>My Site</h1>"
        f"<h2>{title}</h2>"
        f"<p>{body}</p>"
        f"<ul>{lis}</ul>"
        "</body></html>"
    )


SAMPLES = [
    _page("First post", "Alpha body text.", ["a", "b"]),
    _page("Second post", "Beta body text.", ["c"]),
    _page("Third post", "Gamma body text.", ["d", "e", "f"]),
]


def test_induced_reextracts_samples():
    spec = induce_template(SAMPLES)
    titles, bodies, tag_lists = [], [], []
    for html in SAMPLES:
        row = extract(spec, html)
        assert row["status"] == "ok", row["error"]
        # slots in document order: slot_1=title, slot_2=body, slot_3=list
        fields = row["fields"]
        titles.append(fields["slot_1"])
        bodies.append(fields["slot_2"])
        tag_lists.append(fields["slot_3"])
    assert titles == ["First post", "Second post", "Third post"]
    assert bodies == ["Alpha body text.", "Beta body text.", "Gamma body text."]
    assert tag_lists == [["a", "b"], ["c"], ["d", "e", "f"]]


def test_induced_keeps_common_structure_literal():
    spec = induce_template(SAMPLES)
    # The shared <h1>My Site</h1> must be literal (no capture slot).
    html_div = spec["children"][0]  # <html>
    body = html_div["children"][0]  # <body>
    h1 = body["children"][0]
    assert h1["tag"] == "h1"
    assert h1["capture"] is None
    assert h1["children"] == [{"kind": "text", "content": "My Site"}]


def test_induced_matches_unseen_page_of_same_shape():
    spec = induce_template(SAMPLES)
    row = extract(spec, _page("Fourth", "Delta.", ["x", "y"]))
    assert row["status"] == "ok"
    assert row["fields"]["slot_1"] == "Fourth"
    assert row["fields"]["slot_3"] == ["x", "y"]


def test_induced_rejects_structurally_different_page():
    spec = induce_template(SAMPLES)
    row = extract(spec, "<html><body><h1>My Site</h1><table></table></body></html>")
    assert row["status"].startswith("mismatch:")
