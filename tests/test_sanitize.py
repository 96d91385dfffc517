"""Unit tests for the sanitize_text port (page_assemble_model.py:36-67)."""

from high_performance_docling_spark.kernels.sanitize import (
    child_text,
    clean_cell_text,
    cluster_text,
    sanitize_text,
)


def test_single_line_passthrough():
    assert sanitize_text(["hello world"]) == "hello world"
    assert sanitize_text([]) == ""


def test_dehyphenation_joins_alnum_words():
    assert sanitize_text(["the extrac-", "tion engine"]) == "the extraction engine"


def test_hyphen_kept_when_next_starts_nonword():
    # next line's first word token is alnum-checked via regex findall
    assert sanitize_text(["well-", "known fact"]) == "wellknown fact"


def test_plain_lines_join_with_space():
    assert sanitize_text(["one two", "three four"]) == "one two three four"


def test_unicode_normalization():
    assert sanitize_text(["it’s “quoted”", "a ⁄ b • c"]) == 'it\'s "quoted" a / b · c'


def test_trailing_hyphen_word_check_uses_regex_tokens():
    # the alnum check tokenizes with \\b[\\w]+\\b, so "- def" still counts
    # as starting with the word "def" → de-hyphenation applies
    assert sanitize_text(["abc-", "- def"]) == "abc- def"


def test_no_dehyphenation_when_no_words():
    assert sanitize_text(["abc-", "!!!"]) == "abc-!!!"


def test_strip_result():
    assert sanitize_text(["  padded  ", "line  "]) == "padded   line"


def test_clean_cell_text():
    assert clean_cell_text("a\x02b ") == "a-b"


def test_cluster_text_drops_blank_cells():
    assert cluster_text(["a", "   ", "b"]) == "a b"


def test_child_text_no_normalization():
    # children join with spaces but keep unicode (readingorder_model.py:86-91)
    assert child_text(["it’s", "fine-"]) == "it’s fine-"
