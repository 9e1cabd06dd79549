"""Minimal zero-dependency PDF 1.4 writer for the report sink.

Everything here derives from public specifications only: PDF file
syntax and operators from the PDF 1.4 reference (ISO 32000-1 subset —
xref table, page tree, uncompressed content streams, ``BT/Tf/Td/Tj``
text, ``m/l/c/h/b`` paths), glyph advance widths from Adobe's published
base-14 AFM metrics for Helvetica / Helvetica-Bold, and the standard
cubic-Bézier circular-arc approximation (``k = 4/3 · tan(θ/4)``).

Scope is exactly what ``streaming.report.render_pdf`` needs — filled
text in two fonts, solid-color rectangles, and pie wedges — not a
general PDF library. Text is latin + the Polish diacritics the
reference report emits (``Raport.py:121-213``), mapped through one
custom ``/Differences`` encoding onto AGL glyph names.

Output is deterministic byte-for-byte for a given sequence of draw
calls: no timestamps, no /ID, fixed float formatting — so the report
artifact is golden-file testable like its SVG twin.
"""

from __future__ import annotations

import math
import os

# Advance widths (1/1000 em) for chars 32..126, from the public
# Helvetica.afm / Helvetica-Bold.afm base-14 metrics.
_W_HELV = (
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278,
    333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    278, 278, 584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611,
    778, 722, 278, 500, 667, 556, 833, 722, 778, 667, 778, 722, 667,
    611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556, 333,
    556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
    556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500,
    334, 260, 334, 584,
)
_W_HELV_BOLD = (
    278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278,
    333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
    333, 333, 584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611,
    778, 722, 278, 556, 722, 611, 833, 722, 778, 667, 778, 722, 667,
    611, 722, 667, 944, 667, 667, 611, 333, 278, 333, 584, 556, 333,
    556, 611, 556, 611, 556, 333, 611, 611, 278, 278, 556, 278, 889,
    611, 611, 611, 611, 389, 556, 333, 611, 556, 778, 556, 556, 500,
    389, 280, 389, 584,
)

# Non-ASCII characters the report can emit, assigned fixed byte codes
# (deterministic output) with their AGL glyph names for /Differences
# and a base char whose advance width approximates theirs in the AFM.
# Codes start at 0xC0 to stay clear of anything ASCII.
_EXTRA_CHARS: tuple[tuple[str, str, str], ...] = (
    ("ą", "aogonek", "a"),
    ("Ą", "Aogonek", "A"),
    ("ć", "cacute", "c"),
    ("Ć", "Cacute", "C"),
    ("ę", "eogonek", "e"),
    ("Ę", "Eogonek", "E"),
    ("ł", "lslash", "l"),
    ("Ł", "Lslash", "L"),
    ("ń", "nacute", "n"),
    ("Ń", "Nacute", "N"),
    ("ó", "oacute", "o"),
    ("Ó", "Oacute", "O"),
    ("ś", "sacute", "s"),
    ("Ś", "Sacute", "S"),
    ("ź", "zacute", "z"),
    ("Ź", "Zacute", "Z"),
    ("ż", "zdotaccent", "z"),
    ("Ż", "Zdotaccent", "Z"),
    ("—", "emdash", "_"),  # width stand-in; emdash is 1000 — see below
)
_EXTRA_CODE = {ch: 0xC0 + i for i, (ch, _, _) in enumerate(_EXTRA_CHARS)}
_EXTRA_WIDTH_OVERRIDE = {"—": 1000}  # emdash is em-wide in both fonts


def encode_text(s: str) -> bytes:
    """Map a python string to content-stream bytes under our encoding.

    ASCII printable passes through; mapped diacritics take their fixed
    high codes; anything else degrades to ``?`` (the report's actual
    vocabulary is covered). ``( ) \\`` are escaped per the PDF string
    grammar.
    """
    out = bytearray()
    for ch in s:
        if ch in _EXTRA_CODE:
            b = _EXTRA_CODE[ch]
        elif 32 <= ord(ch) <= 126:
            b = ord(ch)
        else:
            b = ord("?")
        if b in (0x28, 0x29, 0x5C):  # ( ) backslash
            out.append(0x5C)
        out.append(b)
    return bytes(out)


def text_width(s: str, size: float, bold: bool = False) -> float:
    """Advance width of ``s`` at ``size`` pt (for centering), per AFM."""
    table = _W_HELV_BOLD if bold else _W_HELV
    units = 0
    for ch in s:
        if ch in _EXTRA_WIDTH_OVERRIDE:
            units += _EXTRA_WIDTH_OVERRIDE[ch]
            continue
        if ch in _EXTRA_CODE:
            ch = next(b for c, _, b in _EXTRA_CHARS if c == ch)
        o = ord(ch) if 32 <= ord(ch) <= 126 else ord("?")
        units += table[o - 32]
    return units * size / 1000.0


def _f(x: float) -> str:
    """Fixed two-decimal float formatting (byte-deterministic)."""
    s = f"{x:.2f}"
    return "0.00" if s == "-0.00" else s


def arc_curves(
    cx: float, cy: float, r: float, a0: float, a1: float
) -> list[tuple[float, float, float, float, float, float]]:
    """Cubic-Bézier control points approximating the circular arc from
    angle ``a0`` to ``a1`` (radians, may run negative = clockwise in
    PDF's y-up space), split into ≤90° segments. Returns ``c`` operator
    args ``(x1, y1, x2, y2, x3, y3)`` assuming the current point is at
    angle ``a0``. Standard construction: ``k = 4/3 · tan(Δ/4)``.
    """
    total = a1 - a0
    n = max(1, math.ceil(abs(total) / (math.pi / 2) - 1e-9))
    step = total / n
    k = 4.0 / 3.0 * math.tan(step / 4.0)
    segs = []
    a = a0
    for _ in range(n):
        b = a + step
        x0, y0 = cx + r * math.cos(a), cy + r * math.sin(a)
        x3, y3 = cx + r * math.cos(b), cy + r * math.sin(b)
        segs.append(
            (
                x0 - k * r * math.sin(a),
                y0 + k * r * math.cos(a),
                x3 + k * r * math.sin(b),
                y3 - k * r * math.cos(b),
                x3,
                y3,
            )
        )
        a = b
    return segs


class Canvas:
    """One PDF page: accumulates content-stream operators.

    Coordinates are native PDF — origin bottom-left, y up, 1 unit =
    1/72 inch.
    """

    def __init__(self, width: float, height: float) -> None:
        self.width = width
        self.height = height
        self._ops: list[str] = []

    # -- painting state ------------------------------------------------
    def _rgb(self, rgb: tuple[float, float, float], stroke: bool) -> None:
        op = "RG" if stroke else "rg"
        self._ops.append(
            f"{_f(rgb[0])} {_f(rgb[1])} {_f(rgb[2])} {op}"
        )

    # -- text ----------------------------------------------------------
    def text(
        self,
        x: float,
        y: float,
        s: str,
        size: float = 12,
        bold: bool = False,
        rgb: tuple[float, float, float] = (0, 0, 0),
        center: bool = False,
    ) -> None:
        """Paint ``s`` with its baseline at ``(x, y)``; ``center=True``
        treats ``x`` as the midpoint (AFM-measured)."""
        if center:
            x -= text_width(s, size, bold) / 2.0
        self._rgb(rgb, stroke=False)
        font = "F2" if bold else "F1"
        payload = encode_text(s).decode("latin-1")
        self._ops.append(
            f"BT /{font} {_f(size)} Tf {_f(x)} {_f(y)} Td ({payload}) Tj ET"
        )

    # -- shapes ----------------------------------------------------------
    def rect(
        self,
        x: float,
        y: float,
        w: float,
        h: float,
        rgb: tuple[float, float, float],
    ) -> None:
        self._rgb(rgb, stroke=False)
        self._ops.append(f"{_f(x)} {_f(y)} {_f(w)} {_f(h)} re f")

    def circle(
        self,
        cx: float,
        cy: float,
        r: float,
        fill: tuple[float, float, float],
        stroke: tuple[float, float, float] | None = None,
    ) -> None:
        self._rgb(fill, stroke=False)
        paint = "f"
        if stroke is not None:
            self._rgb(stroke, stroke=True)
            paint = "b"  # close, fill and stroke
        x0, y0 = cx + r, cy
        self._ops.append(f"{_f(x0)} {_f(y0)} m")
        for seg in arc_curves(cx, cy, r, 0.0, 2.0 * math.pi):
            self._ops.append(" ".join(_f(v) for v in seg) + " c")
        self._ops.append(paint)

    def wedge(
        self,
        cx: float,
        cy: float,
        r: float,
        a0: float,
        a1: float,
        fill: tuple[float, float, float],
        stroke: tuple[float, float, float] | None = None,
    ) -> None:
        """Filled pie slice: center → arc(a0→a1) → close."""
        self._rgb(fill, stroke=False)
        paint = "f"
        if stroke is not None:
            self._rgb(stroke, stroke=True)
            paint = "b"
        x0 = cx + r * math.cos(a0)
        y0 = cy + r * math.sin(a0)
        self._ops.append(f"{_f(cx)} {_f(cy)} m {_f(x0)} {_f(y0)} l")
        for seg in arc_curves(cx, cy, r, a0, a1):
            self._ops.append(" ".join(_f(v) for v in seg) + " c")
        self._ops.append(f"h {paint}")

    def content(self) -> bytes:
        return "\n".join(self._ops).encode("latin-1")


class PdfDocument:
    """Assembles pages into one deterministic PDF 1.4 byte string."""

    def __init__(self) -> None:
        self.pages: list[Canvas] = []

    def new_page(self, width: float, height: float) -> Canvas:
        page = Canvas(width, height)
        self.pages.append(page)
        return page

    def tobytes(self) -> bytes:
        # Object layout: 1 Catalog, 2 Pages, 3 Encoding, 4 F1, 5 F2,
        # then per page: page object, content object.
        diffs = " ".join(f"/{name}" for _, name, _ in _EXTRA_CHARS)
        fixed = [
            "<< /Type /Catalog /Pages 2 0 R >>",
            None,  # Pages — filled in once kid ids are known
            f"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            f"/Differences [{0xC0} {diffs}] >>",
            "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            "/Encoding 3 0 R >>",
            "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
            "/Encoding 3 0 R >>",
        ]
        first_page_obj = len(fixed) + 1
        kids = " ".join(
            f"{first_page_obj + 2 * i} 0 R" for i in range(len(self.pages))
        )
        fixed[1] = (
            f"<< /Type /Pages /Kids [{kids}] /Count {len(self.pages)} >>"
        )
        bodies: list[bytes] = [b.encode("latin-1") for b in fixed]
        for i, page in enumerate(self.pages):
            content = page.content()
            bodies.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox "
                    f"[0 0 {_f(page.width)} {_f(page.height)}] "
                    f"/Resources << /Font << /F1 4 0 R /F2 5 0 R >> >> "
                    f"/Contents {first_page_obj + 2 * i + 1} 0 R >>"
                ).encode("latin-1")
            )
            bodies.append(
                f"<< /Length {len(content)} >>\nstream\n".encode("latin-1")
                + content
                + b"\nendstream"
            )
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: list[int] = []
        for num, body in enumerate(bodies, start=1):
            offsets.append(len(out))
            out += f"{num} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(bodies) + 1}\n".encode("latin-1")
        out += b"0000000000 65535 f \n"
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode("latin-1")
        out += (
            f"trailer\n<< /Size {len(bodies) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode("latin-1")
        return bytes(out)


def write_atomic(path: str, data: bytes) -> None:
    """Write-then-rename so readers never observe a torn file — the
    Spark-side replacement for the reference's psutil open-file guard
    (``Raport.py:91-98``)."""
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
