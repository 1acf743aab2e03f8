"""Property test: render a random query tree to classic syntax, parse it
back, and require the identical tree — pins the lexer, addClause occur
resolution, boosts, slop, and multi-term classification against each other
(renderer and parser are independent implementations)."""

import numpy as np

from lucene_solr_ray.search.queryparser import parse_query


def _render_leaf(node):
    kind = node["kind"]
    t = node["terms"][0]
    if kind == "term":
        s = t
    elif kind == "prefix":
        s = t + "*"
    elif kind == "wildcard":
        s = t
    elif kind == "fuzzy":
        me = node.get("max_edits", 2)
        s = t + ("~" if me == 2 else f"~{me}")
    elif kind == "regexp":
        s = "/" + t + "/"
    elif kind == "phrase":
        s = '"' + " ".join(node["terms"]) + '"'
        if node.get("slop"):
            s += f"~{node['slop']}"
    else:
        raise AssertionError(kind)
    if node.get("boost"):
        s += f"^{node['boost']}"
    return s


def _render(node):
    if node["kind"] != "bool":
        return _render_leaf(node)
    parts = []
    for occ, prefix in (("must", "+"), ("must_not", "-"), ("should", "")):
        for c in node.get(occ, ()):
            inner = _render(c) if c["kind"] != "bool" else "(" + _render(c) + ")"
            if c["kind"] == "bool" and c.get("boost"):
                inner += f"^{c['boost']}"
            parts.append(prefix + inner)
    return " ".join(parts)


def _rand_leaf(rng, depth):
    kind = rng.choice(
        ["term", "term", "term", "prefix", "wildcard", "fuzzy", "regexp", "phrase"]
    )
    word = lambda: "w" + str(rng.integers(0, 99))
    if kind == "phrase":
        n = int(rng.integers(2, 4))
        node = {"kind": "phrase", "terms": [word() for _ in range(n)]}
        if rng.random() < 0.4:
            node["slop"] = int(rng.integers(1, 5))
    elif kind == "wildcard":
        node = {"kind": "wildcard", "terms": [word() + "?x"]}
    elif kind == "fuzzy":
        node = {"kind": "fuzzy", "terms": [word()],
                "max_edits": int(rng.choice([1, 2]))}
    else:
        node = {"kind": kind, "terms": [word()]}
    if rng.random() < 0.3 and kind != "bool":
        node["boost"] = float(int(rng.integers(2, 9)))
    return node


def _rand_tree(rng, depth=0):
    if depth >= 2 or rng.random() < 0.4:
        return _rand_leaf(rng, depth)
    node = {"kind": "bool"}
    n = int(rng.integers(2, 5))
    occs = ["must", "should", "must_not"]
    has_scoring = False
    for _ in range(n):
        occ = occs[int(rng.integers(0, 3))]
        child = _rand_tree(rng, depth + 1)
        node.setdefault(occ, []).append(child)
        has_scoring |= occ != "must_not"
    if not has_scoring:
        node.setdefault("should", []).append(_rand_leaf(rng, depth + 1))
    if depth > 0 and rng.random() < 0.3:
        node["boost"] = float(int(rng.integers(2, 9)))
    return node


def _canon(node):
    """Normalize for comparison: section order fixed by the renderer."""
    if node["kind"] != "bool":
        return node
    out = {"kind": "bool"}
    for occ in ("must", "should", "must_not"):
        if node.get(occ):
            out[occ] = [_canon(c) for c in node[occ]]
    if node.get("boost"):
        out["boost"] = node["boost"]
    return out


def test_render_parse_roundtrip():
    rng = np.random.default_rng(11)
    n_bool = 0
    for trial in range(300):
        tree = _rand_tree(rng)
        if tree["kind"] != "bool" or not (
            len(tree.get("must", []))
            + len(tree.get("should", []))
            + len(tree.get("must_not", []))
            >= 2
            or tree.get("must") or tree.get("must_not")
        ):
            # single optional clause simplifies on parse; skip those shapes
            continue
        n_bool += 1
        s = _render(tree)
        # renderer emits sections in (must, must_not, should) order; compare
        # against the same ordering
        parsed = parse_query(s)
        expect = _canon(tree)
        # renderer order: must, must_not, should — addClause appends in
        # render order, so the parsed lists match section by section
        assert _canon(parsed) == expect, (trial, s, parsed, tree)
    assert n_bool > 150
