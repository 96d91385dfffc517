"""Golden-output regression utilities (the reference's primary test
strategy, SURVEY.md §5)."""

from .regression import (  # noqa: F401
    canonical_layout,
    canonical_spans,
    canonical_table_cells,
    layout_matches,
    spans_hash,
)
