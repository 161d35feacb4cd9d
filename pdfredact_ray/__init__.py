"""pdfredact_ray — a Ray-Data-native rule-driven sensitive-text detection and
masking engine over Parquet tables of multi-turn transcripts.

Re-expresses the semantics of the reference engine (daviburg/PdfRedact, a
single-process .NET CLI over PDFs) as a streaming Ray Data pipeline:

- a "document" becomes a conversation (``conv_id``), a "page" becomes a turn,
- glyph/word/token layout becomes layout runs embedded in (or derived from)
  each turn's ``text``,
- ``RedactionRegion`` bboxes become char-offset spans over the turn's
  searchable text,
- the plan -> apply two-phase workflow becomes plan-table -> hash-join-apply.

Nothing here calls ``ray.init()``: the driver / CLI / test fixture owns the
Ray session.
"""

__version__ = "0.1.0"

from pdfredact_ray.functions.rules import RedactionRule, RuleSet, compile_rules
from pdfredact_ray.functions.mask import redact_turn

__all__ = ["RedactionRule", "RuleSet", "compile_rules", "redact_turn", "__version__"]
