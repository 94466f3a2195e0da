"""Minimal deterministic HTML DOM for the RDFa extractor.

Pure-stdlib (html.parser) tree builder, replacing the reference's
dependency on the ``h5`` HTML5 parser (used at
/root/reference/rdfaparser/rdfaparser.go:177-184). It only needs the
shape the RDFa walk consumes: element nodes with ordered attributes
and children, text nodes, preorder traversal.

Runs inside Arrow-batch UDFs — must stay pure and allocation-light.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Tuple

ELEMENT = 0
TEXT = 1

# HTML void elements (no closing tag).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("type", "tag", "attrs", "children", "text")

    def __init__(
        self,
        type_: int,
        tag: str = "",
        attrs: Optional[List[Tuple[str, str]]] = None,
        text: str = "",
    ):
        self.type = type_
        self.tag = tag
        self.attrs = attrs or []
        self.children: List["Node"] = []
        self.text = text

    def get_attr(self, name: str) -> Optional[str]:
        """First attribute with this name (h5 getAttr semantics,
        rdfaparser.go:43-51)."""
        for k, v in self.attrs:
            if k == name:
                return v
        return None

    def data(self) -> str:
        """Node 'data' — text for text nodes, tag name for elements
        (the h5 Node.Data() notion used for property values,
        rdfaparser.go:105-109)."""
        return self.text if self.type == TEXT else self.tag


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(ELEMENT, tag="#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(ELEMENT, tag=tag, attrs=[(k, v or "") for k, v in attrs])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(ELEMENT, tag=tag, attrs=[(k, v or "") for k, v in attrs])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the matching open tag; ignore stray closers
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(Node(TEXT, text=data))


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree. Leading XML declarations are
    skipped (mirrors rdfaparser.go:168-175)."""
    if html.startswith("<?"):
        end = html.find(">")
        if end >= 0:
            html = html[end + 1 :]
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


# Elements whose subtrees are boilerplate for text extraction.
BOILERPLATE_TAGS = frozenset(
    "script style template nav footer header aside noscript".split()
)


def extract_text(html: str) -> str:
    """Boilerplate-stripped page text.

    Deterministic pure function of the HTML bytes — the per-url
    byte-identical invariant of BASELINE.json input_hint. Drops
    boilerplate subtrees, joins text nodes in document order with
    single spaces (element boundaries are word boundaries), collapses
    all whitespace runs to single spaces.
    """
    return extract_text_from_tree(parse_html(html))


def extract_text_from_tree(root: Node) -> str:
    """extract_text over an already-parsed tree (the extractor parses
    each page once and feeds both the RDFa walk and this strip)."""
    parts: List[str] = []

    def walk(node: Node) -> None:
        if node.type == TEXT:
            parts.append(node.text)
            return
        if node.tag in BOILERPLATE_TAGS:
            return
        for c in node.children:
            walk(c)

    walk(root)
    return " ".join(" ".join(parts).split())
