"""Minimal deterministic HTML DOM for the RDFa extractor.

Pure-stdlib (html.parser) tree builder, replacing the reference's
dependency on the ``h5`` HTML5 parser (used at
/root/reference/rdfaparser/rdfaparser.go:177-184). It only needs the
shape the RDFa walk consumes: element nodes with ordered attributes
and children, text nodes, preorder traversal.

Runs inside Arrow-batch UDFs — must stay pure and allocation-light.
"""

from __future__ import annotations

import re
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


def _parse_html_stdlib(html: str) -> Node:
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


# fast-path tokenizer: 78% of extractor wall time was stdlib
# html.parser's per-character goahead loop (profiled round 3), so the
# common well-formed shape is scanned with compiled regexes instead.
# ANY construct outside that shape returns None and the document takes
# the stdlib path — output is IDENTICAL by construction (same
# handle_* semantics: lowercased names, html.unescape on text runs and
# attribute values, script/style as raw CDATA, void/self-closing not
# pushed), and pinned by an A/B property test + the byte-identical
# text invariant.
_FAST_STARTTAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9-]*)"
    r"((?:\s+[a-zA-Z_:][\-a-zA-Z0-9_:.]*(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s>\"'<=`]+))?)*)"
    r"\s*(/?)>"
)
_FAST_ENDTAG = re.compile(r"</([a-zA-Z][a-zA-Z0-9-]*)\s*>")
_FAST_ATTR = re.compile(
    r"([a-zA-Z_:][\-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s>\"'<=`]+)))?"
)
_CDATA_TAGS = ("script", "style")  # html.parser CDATA_CONTENT_ELEMENTS


def _fast_parse(html: str) -> Optional[Node]:
    from html import unescape

    root = Node(ELEMENT, tag="#document")
    stack = [root]
    i, n = 0, len(html)
    find = html.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            text = html[i:]
            if text:
                if "&" in text:
                    text = unescape(text)
                stack[-1].children.append(Node(TEXT, text=text))
            break
        if lt > i:
            text = html[i:lt]
            if "&" in text:
                text = unescape(text)
            stack[-1].children.append(Node(TEXT, text=text))
        if html.startswith("<!--", lt):
            end = find("-->", lt + 4)
            if end < 0:
                return None  # unterminated comment: stdlib recovery rules
            i = end + 3
            continue
        nxt = html[lt + 1] if lt + 1 < n else ""
        if nxt in "!?":
            # doctype / processing instruction: dropped (no handler).
            # Marked sections (<![CDATA[...]]>) and DOCTYPEs with an
            # internal subset may legally contain '>', so only
            # first-'>'-terminated declarations take the fast path;
            # anything with a '[' before the '>' gets stdlib's
            # declaration parser.
            end = find(">", lt + 1)
            if end < 0:
                return None
            if nxt == "!" and "[" in html[lt + 2 : end]:
                return None  # <![...]> / <!DOCTYPE ... [: stdlib rules
            i = end + 1
            continue
        if nxt == "/":
            m = _FAST_ENDTAG.match(html, lt)
            if m is None:
                return None  # malformed closer: stdlib rules
            tag = m.group(1).lower()
            for j in range(len(stack) - 1, 0, -1):
                if stack[j].tag == tag:
                    del stack[j:]
                    break
            i = m.end()
            continue
        m = _FAST_STARTTAG.match(html, lt)
        if m is None:
            return None  # bare '<' in text / exotic markup: stdlib rules
        tag = m.group(1).lower()
        attrs = [
            (a.group(1).lower(),
             unescape(v) if "&" in (v := a.group(2) or a.group(3) or a.group(4) or "") else v)
            for a in _FAST_ATTR.finditer(m.group(2))
        ]
        node = Node(ELEMENT, tag=tag, attrs=attrs)
        stack[-1].children.append(node)
        self_closing = m.group(3) == "/"
        i = m.end()
        if self_closing or tag in _VOID:
            continue
        if tag in _CDATA_TAGS:
            # raw content to the matching closer, NO entity decoding
            close = html.find(f"</{tag}", i)
            if close < 0:
                return None  # EOF inside CDATA: stdlib recovery rules
            if close > i:
                node.children.append(Node(TEXT, text=html[i:close]))
            mend = _FAST_ENDTAG.match(html, close)
            if mend is None or mend.group(1).lower() != tag:
                return None
            i = mend.end()
            continue
        stack.append(node)
    return root


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree. Leading XML declarations are
    skipped (mirrors rdfaparser.go:168-175). Well-formed documents
    take the regex fast path; anything unusual falls back to the
    stdlib parser with identical output semantics."""
    if html.startswith("<?"):
        end = html.find(">")
        if end >= 0:
            html = html[end + 1 :]
    root = _fast_parse(html)
    if root is None:
        return _parse_html_stdlib(html)
    return root


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
