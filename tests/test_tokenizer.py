"""Object tokenizer units — mirrors the reference's byte-classifier and
parser suites (util.rs:66-108, pdf_file.rs:858-905) on synthesized byte
fixtures, asserting spec-correct semantics."""

from __future__ import annotations

import pytest

from pdfparser_spark.core.errors import ParsingError
from pdfparser_spark.core.objects import Name, Ref, Stream
from pdfparser_spark.core.tokenizer import Tokenizer


def parse(b: bytes):
    v, _ = Tokenizer(b).parse_value(0)
    return v


def test_numbers():
    assert parse(b"42") == 42
    assert parse(b"-17") == -17
    assert parse(b"+3") == 3
    assert parse(b"3.14") == pytest.approx(3.14)
    assert parse(b".5") == pytest.approx(0.5)
    assert parse(b"4.") == pytest.approx(4.0)


def test_booleans_null():
    assert parse(b"true") is True
    assert parse(b"false") is False
    assert parse(b"null") is None


def test_name_with_hex_escape():
    assert parse(b"/Name#20With#2FStuff") == Name("Name With/Stuff")


def test_literal_string_escapes():
    # spec-correct CR/LF escapes (reference pdf_file.rs:428,435 compares 15/12)
    assert parse(rb"(a\nb\rc\td\(e\)f\\g)") == b"a\nb\rc\td(e)f\\g"


def test_literal_string_octal():
    assert parse(rb"(\110ello \165p)") == b"Hello up"


def test_literal_string_nested_parens_and_continuation():
    assert parse(b"(a(b)c)") == b"a(b)c"
    assert parse(b"(one\\\ntwo)") == b"onetwo"


def test_literal_string_raw_eol_normalized():
    assert parse(b"(a\r\nb\rc)") == b"a\nb\nc"


def test_hex_string_both_cases_and_odd():
    assert parse(b"<48656C6C6F>") == b"Hello"
    assert parse(b"<48656c6c6f>") == b"Hello"  # lowercase (spec-correct)
    assert parse(b"<7>") == b"\x70"


def test_array_with_refs():
    # 3-token lookahead: [1 2 0 R 4] -> [1, Ref(2,0), 4]
    assert parse(b"[1 2 0 R 4]") == [1, Ref(2, 0), 4]


def test_nested_dict():
    v = parse(b"<< /A << /B [1 2] >> /C (x) >>")
    assert v == {"A": {"B": [1, 2]}, "C": b"x"}


def test_dict_non_name_key_errors():
    with pytest.raises(ParsingError):
        parse(b"<< (str) 1 >>")


def test_comment_skipped():
    assert parse(b"% comment\n42") == 42


def test_indirect_object():
    tok = Tokenizer(b"7 0 obj\n<< /K 1 >>\nendobj")
    ind, _ = tok.parse_indirect_at(0)
    assert (ind.obj_id, ind.gen) == (7, 0)
    assert ind.value == {"K": 1}


def test_stream_direct_length():
    data = b"<< /Length 5 >>\nstream\nHELLO\nendstream"
    v = parse(data)
    assert isinstance(v, Stream)
    assert v.raw == b"HELLO"


def test_stream_indirect_length_with_resolver():
    data = b"<< /Length 9 0 R >>\nstream\nWORLD\nendstream"
    v, _ = Tokenizer(data, length_resolver=lambda ref: 5).parse_value(0)
    assert v.raw == b"WORLD"


def test_stream_endstream_scan_fallback():
    # /Length lies; fall back to scanning (reference would mis-slice)
    data = b"<< /Length 999 >>\nstream\nABCDE\nendstream"
    v = parse(data)
    assert v.raw == b"ABCDE"


def test_gen_numbers_nonzero():
    assert parse(b"[12 3 R]") == [Ref(12, 3)]
