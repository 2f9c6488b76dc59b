"""Text frontend tests: normalizer goldens, number expansion, G2P, padding.

Golden expectations mirror the reference pipeline's observable behavior
(reference: src/text.py:12-57).
"""

import numpy as np
import pytest

from tacotron2_tpu.config import SYMBOL_TO_ID, SYMBOLS
from tacotron2_tpu.text import (G2p, letter_to_sound, normalize_text,
                                number_to_words, pad_sequences,
                                sequence_to_text, text_to_sequence)


class TestNumberToWords:
    @pytest.mark.parametrize("n,expected", [
        (0, "zero"),
        (5, "five"),
        (13, "thirteen"),
        (20, "twenty"),
        (23, "twenty-three"),
        (100, "one hundred"),
        (105, "one hundred and five"),
        (123, "one hundred and twenty-three"),
        (1000, "one thousand"),
        (1001, "one thousand and one"),
        (2023, "two thousand and twenty-three"),
        (1000100, "one million, one hundred"),
        (1000001, "one million and one"),
        (1234567,
         "one million, two hundred and thirty-four thousand, "
         "five hundred and sixty-seven"),
    ])
    def test_values(self, n, expected):
        assert number_to_words(n) == expected

    def test_string_input(self):
        assert number_to_words("042") == "forty-two"


class TestNormalize:
    def test_lowercase_and_punct(self):
        assert normalize_text("Hello, World!") == "hello world"

    def test_numbers_expanded(self):
        assert normalize_text("I have 2 cats") == "i have two cats"

    def test_hyphen_to_space(self):
        assert normalize_text("well-known") == "well known"

    def test_collapse_whitespace(self):
        assert normalize_text("  a   b\t c ") == "a b c"

    def test_number_with_punct(self):
        # "3.14" -> "3" "." "14" -> "three fourteen"
        assert normalize_text("pi is 3.14") == "pi is three fourteen"


class TestG2p:
    def test_lexicon_word(self):
        g2p = G2p()
        assert list(g2p.pronounce("hello")) == ["HH", "AH0", "L", "OW1"]

    def test_word_separator(self):
        g2p = G2p()
        out = g2p("hello world")
        assert " " in out
        sep = out.index(" ")
        assert out[:sep] == ["HH", "AH0", "L", "OW1"]
        assert out[sep + 1:] == ["W", "ER1", "L", "D"]

    def test_oov_fallback_produces_valid_symbols(self):
        phones = letter_to_sound("zyxxyq")
        assert phones, "fallback must produce something"
        for p in phones:
            assert p in SYMBOL_TO_ID


class TestTextToSequence:
    def test_hello_world(self):
        seq = text_to_sequence("Hello world.")
        expected = [SYMBOL_TO_ID[p] for p in
                    ["HH", "AH0", "L", "OW1", " ", "W", "ER1", "L", "D"]]
        assert seq == expected

    def test_all_ids_valid(self):
        seq = text_to_sequence("The quick brown fox jumps over the lazy dog 42 times.")
        assert all(0 <= i < len(SYMBOLS) for i in seq)
        assert len(seq) > 20

    def test_roundtrip_text(self):
        seq = text_to_sequence("cat")
        assert sequence_to_text(seq) == "K AE1 T"


class TestPadding:
    def test_shapes_and_zero_pad(self):
        tokens, lengths = pad_sequences([[1, 2, 3], [4]], pad_multiple=4)
        assert tokens.shape == (2, 4)
        assert tokens.dtype == np.int32
        np.testing.assert_array_equal(lengths, [3, 1])
        np.testing.assert_array_equal(tokens[1], [4, 0, 0, 0])

    def test_explicit_pad_to(self):
        tokens, _ = pad_sequences([[1, 2]], pad_to=16)
        assert tokens.shape == (1, 16)

    def test_pad_to_too_small(self):
        with pytest.raises(ValueError):
            pad_sequences([[1, 2, 3]], pad_to=2)
