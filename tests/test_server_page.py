"""Static checks over the editor page template (no browser in CI: the
embedded JS cannot be executed, but bracket/string/regex balance catches
the template-breakage class of regression)."""

import re

from nodey_tpu.app import server as web_server


def _extract_js(page: str) -> str:
    m = re.search(r"<script>(.*)</script>", page, re.S)
    assert m, "page has no script block"
    return m.group(1)


def test_page_js_balanced():
    js = _extract_js(web_server._PAGE)
    depth = {"(": 0, "{": 0, "[": 0}
    pairs = {")": "(", "}": "{", "]": "["}
    in_s = None
    esc = False
    i = 0
    line = 1
    prev = ""
    while i < len(js):
        c = js[i]
        if c == "\n":
            line += 1
        if in_s:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == in_s:
                in_s = None
            i += 1
            continue
        if c in ('"', "'", "`"):
            in_s = c
            i += 1
            continue
        if c == "/" and js[i + 1 : i + 2] == "/":
            j = js.find("\n", i)
            i = len(js) if j < 0 else j
            continue
        if (
            c == "/"
            and prev in "(=,:;!&|?{[\n "
            and js[i + 1 : i + 2] not in ("/", "*")
        ):
            # regex literal: scan to the closing /, honoring escapes and
            # character classes
            j = i + 1
            inclass = False
            e = False
            while j < len(js):
                d = js[j]
                if e:
                    e = False
                elif d == "\\":
                    e = True
                elif d == "[":
                    inclass = True
                elif d == "]":
                    inclass = False
                elif d == "/" and not inclass:
                    break
                elif d == "\n":
                    break
                j += 1
            i = j + 1
            prev = "/"
            continue
        if c in depth:
            depth[c] += 1
        elif c in pairs:
            depth[pairs[c]] -= 1
            assert depth[pairs[c]] >= 0, f"unbalanced '{c}' at line {line}"
        if not c.isspace():
            prev = c
        i += 1
    assert in_s is None, "unterminated string/template literal"
    assert all(v == 0 for v in depth.values()), f"unbalanced: {depth}"


def test_page_elements_referenced_by_js_exist():
    """Every getElementById target exists in the markup (a renamed element
    would silently break a handler at runtime)."""
    page = web_server._PAGE
    js = _extract_js(page)
    html = page[: page.index("<script>")]
    ids_in_html = set(re.findall(r'id="([^"]+)"', html))
    ids_in_js = set(re.findall(r"getElementById\('([^']+)'\)", js))
    missing = ids_in_js - ids_in_html
    assert not missing, f"JS references missing elements: {sorted(missing)}"
