"""Public option/enum surface of the engine.

Semantics mirror the reference's typed options (iOverlay/src/core/fill_rule.rs:9-15,
iOverlay/src/core/overlay_rule.rs:13-21, iOverlay/src/core/overlay.rs:30-46) but are
re-expressed as plain Python enums/dataclasses used as parameters of the Spark pipeline
builders — they are *not* data-plane values.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class FillRule(str, Enum):
    """Winding classification rule (reference: iOverlay/src/core/fill_rule.rs:9-15)."""

    EVEN_ODD = "even_odd"
    NON_ZERO = "non_zero"
    POSITIVE = "positive"
    NEGATIVE = "negative"

    @classmethod
    def from_code(cls, code: int) -> "FillRule":
        # fixture JSON encodes 0=EvenOdd 1=NonZero 2=Positive 3=Negative
        return [cls.EVEN_ODD, cls.NON_ZERO, cls.POSITIVE, cls.NEGATIVE][code]


class OverlayRule(str, Enum):
    """Boolean operation selector (reference: iOverlay/src/core/overlay_rule.rs:13-21)."""

    SUBJECT = "subject"
    CLIP = "clip"
    INTERSECT = "intersect"
    UNION = "union"
    DIFFERENCE = "difference"
    INVERSE_DIFFERENCE = "inverse_difference"
    XOR = "xor"


ALL_RULES = (
    OverlayRule.SUBJECT,
    OverlayRule.CLIP,
    OverlayRule.INTERSECT,
    OverlayRule.UNION,
    OverlayRule.DIFFERENCE,
    OverlayRule.INVERSE_DIFFERENCE,
    OverlayRule.XOR,
)


class ContourDirection(str, Enum):
    COUNTER_CLOCKWISE = "ccw"
    CLOCKWISE = "cw"


@dataclass(frozen=True)
class OverlayOptions:
    """Output-shaping options (reference: IntOverlayOptions, iOverlay/src/core/overlay.rs:30-46)."""

    preserve_input_collinear: bool = False
    output_direction: ContourDirection = ContourDirection.COUNTER_CLOCKWISE
    preserve_output_collinear: bool = False
    min_output_area: int = 0

    @classmethod
    def fixture_defaults(cls) -> "OverlayOptions":
        # matches the reference test runner (iOverlay/tests/overlay_tests.rs:22-28)
        return cls(
            preserve_input_collinear=False,
            output_direction=ContourDirection.CLOCKWISE,
            preserve_output_collinear=False,
            min_output_area=0,
        )


DEFAULT_OPTIONS = OverlayOptions()
