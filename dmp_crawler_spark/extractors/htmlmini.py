"""Minimal jsoup-compatible DOM on stdlib html.parser.

The reference extracts fields with jsoup CSS selectors and relies on
jsoup's `Element.text()` whitespace normalization (single-space join,
trim, block-element boundaries become single spaces). This module
reimplements exactly those semantics in pure Python so that (a) the
extraction oracle and (b) the vectorized pandas-UDF extractors share one
byte-identical text function (the per-row invariant in BASELINE.json).

jsoup text() rule replicated (jsoup Element.text() / appendNormalisedText):
  - text nodes: collapse runs of whitespace to one space; drop a leading
    space if the accumulator is empty or already ends with a space
  - element nodes: if block-level or <br>, and accumulator is non-empty
    and doesn't end with a space, append one space
  - final result is trimmed

Selector subset (all the reference uses — SURVEY.md §2.7 C23):
  tag, #id, .class, [attr], [attr=val], compound (div.a#b[x=y]),
  descendant combinator (space), child combinator (>), grouping (,).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

# jsoup's block-level tag set (org.jsoup.parser.Tag isBlock), trimmed to
# tags that can plausibly appear in our corpora.
_BLOCK = {
    "html", "body", "head", "div", "p", "ul", "ol", "li", "table", "tr",
    "td", "th", "thead", "tbody", "tfoot", "h1", "h2", "h3", "h4", "h5",
    "h6", "blockquote", "pre", "dl", "dt", "dd", "section", "article",
    "header", "footer", "nav", "aside", "form", "fieldset", "hr",
    "script", "style", "title",
}

_WS_RE = re.compile(r"\s+")


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None,
                 parent: "Element | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[object] = []  # Element | str (text node)
        self.parent = parent

    # -- attribute / class helpers ------------------------------------
    def attr(self, name: str) -> str:
        return self.attrs.get(name, "")

    def has_class(self, cls: str) -> bool:
        return cls in self.attrs.get("class", "").split()

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    # -- traversal ------------------------------------------------------
    def iter_elements(self):
        for ch in self.children:
            if isinstance(ch, Element):
                yield ch
                yield from ch.iter_elements()

    def child_elements(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def next_element_sibling(self) -> "Element | None":
        if self.parent is None:
            return None
        sibs = self.parent.child_elements()
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    # -- jsoup text() ----------------------------------------------------
    def text(self) -> str:
        parts: list[str] = []

        def ends_with_space() -> bool:
            return bool(parts) and parts[-1].endswith(" ")

        def walk(el: Element) -> None:
            # jsoup parses <script>/<style> content as DataNode, which
            # Element.text() excludes — replicate that.
            if el.tag in ("script", "style"):
                return
            for ch in el.children:
                if isinstance(ch, str):
                    norm = _WS_RE.sub(" ", ch)
                    if norm.startswith(" ") and (not parts or ends_with_space()):
                        norm = norm[1:]
                    if norm:
                        parts.append(norm)
                else:
                    if (ch.tag in _BLOCK or ch.tag == "br") and parts and not ends_with_space():
                        parts.append(" ")
                    walk(ch)

        walk(self)
        return "".join(parts).strip()

    def own_text(self) -> str:
        """jsoup ownText(): normalized text of direct text-node children."""
        parts: list[str] = []
        for ch in self.children:
            if isinstance(ch, str):
                norm = _WS_RE.sub(" ", ch)
                if norm.startswith(" ") and (not parts or parts[-1].endswith(" ")):
                    norm = norm[1:]
                if norm:
                    parts.append(norm)
        return "".join(parts).strip()

    def html_inner(self) -> str:
        out: list[str] = []
        for ch in self.children:
            if isinstance(ch, str):
                out.append(ch)
            else:
                out.append(ch.html_outer())
        return "".join(out)

    def html_outer(self) -> str:
        a = "".join(f' {k}="{v}"' for k, v in self.attrs.items())
        if self.tag in _VOID:
            return f"<{self.tag}{a}>"
        return f"<{self.tag}{a}>{self.html_inner()}</{self.tag}>"

    # -- CSS select -------------------------------------------------------
    def select(self, selector: str) -> list["Element"]:
        out: list[Element] = []
        seen: set[int] = set()
        for group in selector.split(","):
            for el in _select_group(self, group.strip()):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
        return out

    def select_one(self, selector: str) -> "Element | None":
        res = self.select(selector)
        return res[0] if res else None

    def elements_containing_own_text(self, needle: str) -> list["Element"]:
        """jsoup getElementsContainingOwnText."""
        return [el for el in self.iter_elements() if needle in el.own_text()]

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.tag} id={self.id!r}>"


_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[#.][\w-]+|\[[^\]]+\])*)"
)
_PART_RE = re.compile(r"([#.][\w-]+|\[[^\]]+\])")


def _match_simple(el: Element, simple: str) -> bool:
    m = _SIMPLE_RE.fullmatch(simple)
    if not m:
        return False
    tag = m.group("tag")
    if tag and tag != "*" and el.tag != tag.lower():
        return False
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("#"):
            if el.id != part[1:]:
                return False
        elif part.startswith("."):
            if not el.has_class(part[1:]):
                return False
        else:  # [attr], [attr=val], [attr^=val], [attr!=val] (jsoup)
            body = part[1:-1]
            if "!=" in body:
                # jsoup [attr!=val]: matches when the attribute differs OR
                # is absent entirely (attr() returns '' for missing)
                k, v = body.split("!=", 1)
                v = v.strip("\"'")
                if el.attrs.get(k.strip(), "") == v:
                    return False
            elif "^=" in body:
                k, v = body.split("^=", 1)
                v = v.strip("\"'")
                if not el.attrs.get(k.strip(), "").startswith(v):
                    return False
            elif "=" in body:
                k, v = body.split("=", 1)
                v = v.strip("\"'")
                if el.attrs.get(k.strip()) != v:
                    return False
            else:
                if body.strip() not in el.attrs:
                    return False
    return True


def _select_group(root: Element, group: str) -> list[Element]:
    """jsoup-semantics select: candidates are the context element itself
    plus its descendants (jsoup Element.getAllElements includes self — the
    reference leans on this, e.g. font.select("font > div > h4") where the
    context font matches the leftmost part), matched right-to-left; the
    ancestor chain for combinators may climb ABOVE the context element
    (jsoup evaluates ancestry absolutely, not subtree-bounded)."""
    tokens = re.findall(r">|[^\s>]+", group)
    if not tokens:
        return []
    simples: list[str] = [tokens[0]]
    combs: list[str] = [""]  # combinator to the LEFT of simples[k]
    i = 1
    while i < len(tokens):
        comb = " "
        if tokens[i] == ">":
            comb = ">"
            i += 1
        simples.append(tokens[i])
        combs.append(comb)
        i += 1

    def chain_ok(el: Element, k: int) -> bool:
        if k == 0:
            return True
        if combs[k] == ">":
            p = el.parent
            return (
                p is not None and p.tag != "#root"
                and _match_simple(p, simples[k - 1]) and chain_ok(p, k - 1)
            )
        p = el.parent
        while p is not None and p.tag != "#root":
            if _match_simple(p, simples[k - 1]) and chain_ok(p, k - 1):
                return True
            p = p.parent
        return False

    last = len(simples) - 1
    pool = ([root] if root.tag != "#root" else []) + list(root.iter_elements())
    return [el for el in pool if _match_simple(el, simples[last]) and chain_ok(el, last)]


class _Builder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack = [self.root]
        self._raw_stack: list[str] = []  # inside <script>/<style>

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse(html: str) -> Element:
    b = _Builder()
    b.feed(html or "")
    return b.root


def jsoup_text(html: str) -> str:
    """The byte-identical text contract: jsoup Document.text() of html."""
    return parse(html).text()
