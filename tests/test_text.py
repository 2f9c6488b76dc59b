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


class TestLetterToSound:
    """Pins for the r3 LTS rewrite (affix-aware stress, cluster rules;
    measured on held-out CMUdict by tools/eval_g2p.py — see
    TestG2pHeldOutAccuracy for the tracked floors)."""

    def test_one_primary_stress(self):
        # every LTS output carries exactly one primary-stressed vowel
        for w in ("tomasetti", "brillantine", "vortigern", "zanzibar"):
            stresses = [p for p in letter_to_sound(w) if p.endswith("1")]
            assert len(stresses) == 1, (w, letter_to_sound(w))

    def test_doubled_consonants_collapse(self):
        assert letter_to_sound("carrillo").count("R") == 1
        assert letter_to_sound("tomassetti").count("T")  # no TT doubling
        assert "S S" not in " ".join(letter_to_sound("tomassetti"))

    def test_germanic_slavic_clusters(self):
        assert letter_to_sound("schmidt")[0] == "SH"
        assert letter_to_sound("szczepan")[0] == "SH"
        assert "CH" in letter_to_sound("czerny")

    def test_soft_c_g(self):
        assert "S" in letter_to_sound("cipher")[:1]
        assert letter_to_sound("gentry")[0] == "JH"
        assert letter_to_sound("cobble")[0] == "K"   # hard c before o

    def test_suffix_stress_steal(self):
        # -ation carries the primary; stem vowels are reduced
        ph = letter_to_sound("flambation")
        assert "EY1" in ph
        assert [p for p in ph if p.endswith("1")] == ["EY1"]

    def test_silent_onset_and_mc(self):
        assert letter_to_sound("knabble")[0] == "N"
        assert letter_to_sound("mcgillis")[:3] == ["M", "AH0", "K"]

    def test_final_y_is_vowel(self):
        assert letter_to_sound("blicky")[-1] == "IY0"

    def test_doubled_consonant_suffixes_match_raw_spelling(self):
        # -ette/-ness/-less contain doubles: they must match the raw
        # word, before the doubled-consonant collapse rewrites it
        assert letter_to_sound("brunette")[-2:] == ["EH1", "T"]
        assert [p for p in letter_to_sound("brunette")
                if p.endswith("1")] == ["EH1"]
        assert letter_to_sound("darkness")[-3:] == ["N", "AH0", "S"]
        assert letter_to_sound("helpless")[-3:] == ["L", "AH0", "S"]


class TestRomanceLts:
    """Italian/Spanish-shaped OOVs (vowel-final polysyllables without
    k/w/x/y/j/th/sh) take the phonemic Romance rule set: pure vowel
    qualities, penultimate primary stress, ci/gi affricates, and no
    vowel reduction on unstressed syllables.  Goldens are CMUdict
    entries (held out at eval time)."""

    @pytest.mark.parametrize("word,truth", [
        ("napoletano", "N AA0 P OW0 L EH0 T AA1 N OW0"),
        ("olivero", "OW0 L IY0 V EH1 R OW0"),
        ("rutigliano", "R UW0 T IY0 G L IY0 AA1 N OW0"),
    ])
    def test_cmudict_exact(self, word, truth):
        assert " ".join(letter_to_sound(word)) == truth

    def test_affricates_and_double_z(self):
        # gg+i -> bare /JH/, zz -> /T S/, final a -> AH0
        assert "JH" in letter_to_sound("caggiano")
        pal = letter_to_sound("palazzolo")
        assert ["T", "S"] == [p for p in pal if p in ("T", "S")]
        assert letter_to_sound("garagiola")[-1] == "AH0"

    def test_english_words_keep_english_rules(self):
        # consonant-final, th-containing, or y/k/w-bearing words never
        # take the Romance path
        from tacotron2_tpu.text.g2p import _romance_shape
        for w in ("brunette", "darkness", "thermato", "blicky",
                  "woodcutters"):
            assert not _romance_shape(w), w


class TestCompoundPlausibility:
    """Compound halves that are really CMUdict abbreviation entries
    (letter-spellings like "mit" -> /EH M AY T IY/) must be rejected,
    not glued into junk ("commit" != com + M.I.T.)."""

    def test_initialism_halves_rejected(self):
        g2p = G2p()
        # 'commit' and 'absher' held out of the lexicon -> must NOT
        # resolve via a letter-spelled compound half
        lex = dict(g2p._lexicon)
        for w in ("commit", "absher"):
            lex.pop(w, None)
        g2p2 = G2p(lexicon=lex)
        for w in ("commit", "absher"):
            phones = list(g2p2.pronounce(w))
            # letter-spelling artifacts: a run like EH M AY T IY
            assert "AY2" not in phones and "IY2" not in phones, (w, phones)

    def test_real_compounds_still_split(self):
        g2p = G2p()
        lex = dict(g2p._lexicon)
        lex.pop("woodcutters", None)
        g2p2 = G2p(lexicon=lex)
        phones = list(g2p2.pronounce("woodcutters"))
        assert phones[:2] == ["W", "UH1"] and phones[-1] == "Z"


class TestNeuralLts:
    """The TPU-trained neural LTS (text/lts_neural.py) and its numpy
    inference against the committed artifact."""

    def test_heldout_words_exact(self):
        """Holdout words (never in neural OR n-gram training) the
        committed artifact is known to get exactly right, INCLUDING
        stress — pins the numpy decode against the trained weights.
        The critical regression this guards: the encoder must replicate
        the trainer's zero-padding (the backward LSTM's walk over the
        trailing pads shapes the real positions' states; dropping it
        produced looping decodes — see _encode's docstring)."""
        from tacotron2_tpu.text.lts_model import is_model_holdout
        from tacotron2_tpu.text.lts_neural import load_default_model
        m = load_default_model()
        if m is None:
            import pytest
            pytest.skip("neural LTS artifact not shipped")
        for word, truth in [
            ("abbreviating",
             "AH0 B R IY1 V IY0 EY2 T IH0 NG"),
            ("abductor", "AE0 B D AH1 K T ER0"),
            ("abelson", "AE1 B IH0 L S AH0 N"),
        ]:
            assert is_model_holdout(word)
            assert m.pronounce(word) == truth.split(), word

    def test_unencodable_words_fall_through(self):
        from tacotron2_tpu.text.lts_neural import load_default_model
        m = load_default_model()
        if m is None:
            import pytest
            pytest.skip("neural LTS artifact not shipped")
        assert m.pronounce("can't") is None       # non a-z
        assert m.pronounce("x" * 30) is None      # beyond length cap

    def test_cascade_prefers_neural(self):
        """resolution() reports the model stage for an OOV the neural
        decoder handles; the kill-switch restores the n-gram path."""
        from tacotron2_tpu.text.g2p import G2p
        from tacotron2_tpu.text.lts_neural import load_default_model
        if load_default_model() is None:
            import pytest
            pytest.skip("neural LTS artifact not shipped")
        g2p = G2p()
        if g2p._lts_neural is None:
            import pytest
            pytest.skip("neural LTS inactive")
        phones = g2p._model_lts("brillig")
        assert phones and any(p.endswith("1") for p in phones)


class TestG2pHeldOutAccuracy:
    """Tracked floors for the OOV cascade, measured by holding real
    CMUdict words out of the lexicon (tools/eval_g2p.py).  r2 baseline on
    this sample: 35% stress-blind word accuracy / 21.5% PER; the r3 LTS
    rewrite reached 41.6% / 17.3% (n=8000); the suffix-before-collapse
    fix 42.4% / 16.8% (n=4000); and the Romance LTS sub-path + the
    compound initialism filter (vowel-letter counting keeps hiatus
    halves like "lion") 43.6% / 15.8%, and the German-skewed ei->AY
    flip 43.7% / 15.8% (n=4000).  The measured-rule pass that followed
    (unstressed Latinate prefixes, surname suffix batch + seam dedupe,
    magic-e lengthening with the raw-double-consonant block, u y-glide,
    vowel hiatus glides, final-i/-o long vowels, silent post-vocalic h,
    tz/dt finals, EH->AH reduction) reached **46.7% / 14.4%** on the
    n=4000 dev sample and **46.15% / 14.69% at n=8000** (vs r2's
    41.6% / 17.3%).  r4 replaced the rule cascade's last-resort role
    with the TRAINED graphone n-gram (tools/train_lts.py, decoded by
    text/lts_model.py), ordered before compound splitting: **67.25% /
    8.36% at n=8000** (stress-blind; 61.38% with stress), scored ONLY
    on the model's own 10% CMUdict training holdout so no evaluated
    word was n-gram training data.  r5 improved BOTH stages of the
    fallback: (a) the graphone decoder — Kneser-Ney-style absolute
    discounting (D=0.9) + beam 24 over the unchanged counts, 67.25% ->
    68.87% at n=8000 — and (b) a TPU-trained NEURAL seq2seq LTS
    (tools/train_lts_neural.py, numpy inference in text/lts_neural.py)
    ordered ahead of the n-gram: full cascade **73.16% / 6.40% at
    n=8000** (69.30% with stress) and **74.17% / 6.42%** on this test's
    exact sample (seed 1, n=600) — the g2p_en neural-LTS class.  Floors
    sit below the measured values so normal lexicon drift doesn't
    flake, but any regression toward the rule-only LTS trips them."""

    def test_heldout_floors(self):
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.eval_g2p import evaluate
        stats, _ = evaluate(n=600, seed=1, n_misses=0)
        # measured 74.17% / 6.42% on this exact sample (seed 1, n=600)
        assert stats["word_acc"] > 0.68, stats
        assert stats["per"] < 0.085, stats
        # morphology stage stays strong
        st = stats["by_stage"].get("morphology", {"n": 0, "word_ok": 0})
        if st["n"] >= 20:
            assert st["word_ok"] / st["n"] > 0.7, st


class TestG2pFallbackCascade:
    """Golden cases for each OOV-resolution stage (lexicon miss -> fix).
    These are the words the normalizer actually produces from real text:
    apostrophes are stripped (src/text.py analog), inflections may be
    absent from CMUdict, and compounds fall through entirely."""

    @pytest.fixture(scope="class")
    def g2p(self):
        return G2p()

    # -- stage 2: apostrophe restoration (contractions) --
    @pytest.mark.parametrize("word,phones", [
        ("dont", ["D", "OW1", "N", "T"]),
        ("isnt", ["IH1", "Z", "AH0", "N", "T"]),
        ("couldnt", ["K", "UH1", "D", "AH0", "N", "T"]),
        ("shes", ["SH", "IY1", "Z"]),
        ("theyre", ["DH", "EH1", "R"]),
        ("ive", ["AY1", "V"]),
        ("youll", ["Y", "UW1", "L"]),
        ("whos", ["HH", "UW1", "Z"]),
        ("oclock", ["AH0", "K", "L", "AA1", "K"]),
    ])
    def test_contractions(self, g2p, word, phones):
        assert g2p.resolution(word) in ("apostrophe", "lexicon")
        assert list(g2p.pronounce(word)) == phones

    # -- stage 3: regular morphology on synthetic stems the lexicon
    #    can't already contain (forcing the suffix rules to fire) --
    def test_plural_voicing(self, g2p):
        lex = {"blick": ("B", "L", "IH1", "K"),      # voiceless -> S
               "blug": ("B", "L", "AH1", "G"),       # voiced -> Z
               "blush": ("B", "L", "AH1", "SH")}     # sibilant -> IH0 Z
        g = G2p(lexicon=lex)
        assert list(g.pronounce("blicks")) == ["B", "L", "IH1", "K", "S"]
        assert list(g.pronounce("blugs")) == ["B", "L", "AH1", "G", "Z"]
        assert list(g.pronounce("blushes")) == \
            ["B", "L", "AH1", "SH", "IH0", "Z"]

    def test_past_tense_voicing(self, g2p):
        lex = {"blick": ("B", "L", "IH1", "K"),      # voiceless -> T
               "blug": ("B", "L", "AH1", "G"),       # voiced -> D
               "blat": ("B", "L", "AE1", "T")}       # T/D -> IH0 D
        g = G2p(lexicon=lex)
        assert list(g.pronounce("blicked")) == ["B", "L", "IH1", "K", "T"]
        assert list(g.pronounce("blugged")) == ["B", "L", "AH1", "G", "D"]
        assert list(g.pronounce("blatted")) == \
            ["B", "L", "AE1", "T", "IH0", "D"]

    def test_ing_with_e_restoration_and_undoubling(self, g2p):
        lex = {"make": ("M", "EY1", "K"), "run": ("R", "AH1", "N")}
        g = G2p(lexicon=lex)
        assert list(g.pronounce("making")) == \
            ["M", "EY1", "K", "IH0", "NG"]
        assert list(g.pronounce("running")) == \
            ["R", "AH1", "N", "IH0", "NG"]

    # -- stage 4: compound splitting --
    def test_compound_split(self, g2p):
        # r4: the trained LTS model now sits before compound splitting
        # in the cascade (it beat the splitter 62% vs 39% on held-out
        # CMUdict) — any of the three stages may claim the word, but the
        # pronunciation must stay the correct wood+cutters reading.
        assert g2p.resolution("woodcutters") in ("compound", "lexicon",
                                                 "lts_model")
        phones = list(g2p.pronounce("woodcutters"))
        # wood + cutters
        assert phones[:3] == ["W", "UH1", "D"]
        assert phones[-2:] == ["ER0", "Z"]

    def test_real_word_never_reaches_lts(self, g2p):
        # A sample of LJSpeech-register vocabulary: everything resolves
        # before the rule LTS.
        words = ("printing exhibition comparatively woodcutters "
                 "netherlands predecessors fifteenth movable justly "
                 "dont wasnt oclock improvements manufactured").split()
        for w in words:
            assert g2p.resolution(w) != "lts", w


class TestG2pDivergences:
    """DOCUMENTED divergences from the reference's g2p_en
    (reference: src/text.py:35): heteronym choice uses deterministic
    context rules (tacotron2_tpu/text/homographs.py) instead of g2p_en's
    statistical POS tagger; pairs POS cannot separate ("bass") take
    CMUdict's first variant.  These tests pin the behavior so a silent
    change is caught."""

    def test_heteronym_defaults_are_deterministic(self):
        g2p = G2p()
        # context-free defaults
        assert list(g2p.pronounce("read")) == ["R", "IY1", "D"]
        assert g2p.pronounce("read") == g2p.pronounce("read")
        assert g2p.pronounce("lives") == g2p.pronounce("lives")
        # 'bass' is not POS-resolvable: first CMUdict variant, always
        assert g2p.pronounce("bass") == g2p.pronounce("bass")
        assert list(g2p.pronounce("bass")) == ["B", "AE1", "S"]

    def test_noun_default_overrides_cmudict_first_variant(self):
        # Deliberate deviations pinned: CMUdict lists the VERB first for
        # these, but with no context cue the (far more common) noun
        # reading wins — marked as overrides in homographs.py.
        g2p = G2p()
        assert list(g2p.pronounce("subject")) == \
            ["S", "AH1", "B", "JH", "IH0", "K", "T"]
        assert list(g2p.pronounce("record")) == \
            ["R", "EH1", "K", "ER0", "D"]
        assert list(g2p.pronounce("wind")) == ["W", "IH1", "N", "D"]

    def test_homographs_can_be_disabled(self):
        g2p = G2p(homographs=False)
        # plain first-variant lookup (CMUdict lists R EH1 D first)
        assert list(g2p.pronounce("read")) == ["R", "EH1", "D"]


class TestHomographs:
    """Context-driven heteronym resolution (the g2p_en homograph-lexicon
    counterpart, reference: src/text.py:35)."""

    def phones(self, text):
        return " ".join(G2p()(text))

    def test_read_tense(self):
        assert "R IY1 D" in self.phones("i will read the book")
        assert "R EH1 D" in self.phones("i have read the book")

    def test_wind_noun_vs_verb(self):
        assert "W IH1 N D" in self.phones("the wind was strong")
        assert "W AY1 N D" in self.phones("please wind the clock")

    def test_use_voicing(self):
        assert "Y UW1 Z" in self.phones("they will use it")
        assert "Y UW1 S" in self.phones("the use of force")

    def test_live_vowel(self):
        assert "L AY1 V" in self.phones("a live concert")
        assert "L IH1 V" in self.phones("they live in boston")

    def test_record_stress(self):
        assert "R AH0 K AO1 R D" in self.phones("she will record the song")
        assert "R EH1 K ER0 D" in self.phones("the record shows")

    def test_separate_ate(self):
        assert "S EH1 P ER0 IH0 T" in self.phones("a separate issue")
        assert "S EH1 P ER0 EY2 T" in self.phones("to separate the parts")

    def test_every_pron_is_a_cmudict_variant(self):
        """The curated table must never invent a pronunciation: every
        entry is verbatim one of the word's CMUdict variants."""
        from tacotron2_tpu.text.homographs import (HOMOGRAPHS,
                                                   TENSE_HETERONYMS)
        from tacotron2_tpu.text.lexicon import (find_lexicon_path,
                                                parse_cmudict_variants)
        variants = parse_cmudict_variants(find_lexicon_path())
        for word, entry in HOMOGRAPHS.items():
            assert entry.verb in variants[word], (word, entry.verb)
            assert entry.other in variants[word], (word, entry.other)
            assert entry.verb != entry.other, word
            assert entry.default in ("verb", "other"), word
        for word, (past, nonpast, default) in TENSE_HETERONYMS.items():
            assert past in variants[word], (word, past)
            assert nonpast in variants[word], (word, nonpast)
            assert default in ("past", "nonpast"), word

    def test_full_pipeline_uses_context(self):
        # through text_to_sequence (normalize + G2P + IDs)
        ids_v = text_to_sequence("They will use it.")
        ids_n = text_to_sequence("The use of force.")
        assert SYMBOL_TO_ID["Z"] in ids_v
        assert SYMBOL_TO_ID["Z"] not in ids_n[:6]  # 'use' early: /S/ not /Z/


class TestG2pCoverage:
    def test_report_on_ljspeech_register_text(self):
        from tacotron2_tpu.text.analysis import g2p_coverage
        texts = [
            "Printing, in the only sense with which we are at present "
            "concerned, differs from most if not from all the arts and "
            "crafts represented in the Exhibition.",
            "The invention of movable metal letters in the middle of the "
            "fifteenth century may justly be considered as the invention "
            "of the art of printing.",
            "He said he couldn't pay the 150 pounds before 10 o'clock.",
        ]
        report = g2p_coverage(texts)
        assert report["total_tokens"] > 50
        # SURVEY/VERDICT target: hard OOV (rule-LTS) rate under 1%
        assert report["hard_oov_rate"] < 0.01
        assert report["tokens_by_stage"]["lexicon"] > \
            0.9 * report["total_tokens"]


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


class TestHomographsR4Expansion:
    """r4 heteronym-table expansion (VERDICT r3 item 8): entries curated
    from the heteronym audit (text/analysis.py::heteronym_audit; evidence
    in docs/evidence_r4/heteronym_audit.json — covered heteronym tokens
    over the in-repo sample rose 21 -> 31, and the table now spans the
    standard initial-stress-noun / final-stress-verb alternation class)."""

    def test_context_cues_pick_readings(self):
        from tacotron2_tpu.text.homographs import disambiguate

        def t(s):
            return tuple(s.split())

        # verb cue ("to", "will", ...) -> final-stress reading
        assert disambiguate("address", "to") == t("AH0 D R EH1 S")
        assert disambiguate("impact", "will") == t("IH0 M P AE1 K T")
        assert disambiguate("survey", "to") == t("S ER0 V EY1")
        assert disambiguate("recall", "can") == t("R IH0 K AO1 L")
        assert disambiguate("reject", "to") == t("R IH0 JH EH1 K T")
        # noun cue ("the", "a", "of", ...) -> initial-stress reading
        assert disambiguate("address", "the") == t("AE1 D R EH2 S")
        assert disambiguate("impact", "the") == t("IH1 M P AE0 K T")
        assert disambiguate("research", "the") == t("R IY1 S ER0 CH")
        assert disambiguate("defect", "a") == t("D IY1 F EH0 K T")
        assert disambiguate("transport", "of") == t("T R AE1 N S P AO0 R T")

    def test_overridden_defaults_follow_usage(self):
        """No-cue defaults that override CMUdict's first variant pick the
        usage-dominant reading."""
        from tacotron2_tpu.text.homographs import disambiguate

        def t(s):
            return tuple(s.split())

        assert disambiguate("research") == t("R IY1 S ER0 CH")   # noun
        assert disambiguate("impact") == t("IH1 M P AE0 K T")    # noun
        assert disambiguate("compress") == t("K AH0 M P R EH1 S")  # verb
        assert disambiguate("recall") == t("R IH0 K AO1 L")      # verb
        assert disambiguate("incense") == t("IH1 N S EH2 N S")   # noun

    def test_audit_counts_covered_and_candidates(self):
        from tacotron2_tpu.text.analysis import heteronym_audit
        rep = heteronym_audit([
            "The impact of the survey will impact the research.",
            "They will survey the annex to address the defect.",
        ])
        assert rep["covered_tokens"] >= 6   # impact x2, survey x2, ...
        assert rep["total_tokens"] > 0
        assert 0.0 <= rep["candidate_miss_rate"] <= 1.0

    def test_r5_queue_burndown(self):
        """r5 (VERDICT r4 item 4): the top-100-by-frequency curation
        queue is burned down — stress heteronyms became table entries,
        context-free overrides cover prefix/initialism fragments, and
        audited free-variation words count as curated coverage instead
        of candidate misses."""
        from tacotron2_tpu.text.analysis import heteronym_audit
        from tacotron2_tpu.text.homographs import (CURATED_SINGLE_READING,
                                                   disambiguate)

        def t(s):
            return tuple(s.split())

        # new stress-heteronym entries
        assert disambiguate("update", "will") == t("AH0 P D EY1 T")
        assert disambiguate("update", "the") == t("AH1 P D EY2 T")
        assert disambiguate("resume", "to") == t("R IH0 Z UW1 M")
        assert disambiguate("resume", "her") == t("R EH1 Z AH0 M EY2")
        # context-free preferred readings (split-hyphen prefix, initialism)
        assert disambiguate("re") == t("R IY1")
        assert disambiguate("pos") == t("P IY1 OW1 EH1 S")
        # curated words leave the miss queue and count as curated tokens
        assert {"hundred", "data", "process", "cache"} \
            <= CURATED_SINGLE_READING
        rep = heteronym_audit(
            ["one hundred twenty seven epochs of data without a resume"])
        assert rep["curated_single_reading_tokens"] >= 4
        assert all(m["word"] not in CURATED_SINGLE_READING
                   for m in rep["top_candidate_misses"])

    def test_materiality_filter_and_weak_forms(self):
        """The curation queue must keep true reading differences and drop
        free variation: unstressed-vowel presence/quality collapses (the
        'gentle'/'the' classes), closed-class weak forms never enqueue,
        and a stressed-vowel contrast ('read') stays material."""
        from tacotron2_tpu.text.analysis import (_WEAK_FORMS,
                                                 _material_variants)
        # stressed-vowel contrast: THE heteronym class — material
        assert _material_variants([("R", "IY1", "D"), ("R", "EH1", "D")])
        # moved primary stress — material
        assert _material_variants(
            [("S", "ER1", "V", "EY2"), ("S", "ER0", "V", "EY1")])
        # unstressed-schwa insertion — NOT material
        assert not _material_variants(
            [("S", "IH1", "M", "P", "AH0", "L"),
             ("S", "IH1", "M", "P", "L")])
        # unstressed vowel QUALITY jitter (AH0 vs IH0 vs ER0) — NOT material
        assert not _material_variants(
            [("R", "OW1", "Z", "AH0", "Z"), ("R", "OW1", "Z", "IH0", "Z")])
        # schwa inserted BEFORE the stressed vowel must not fake a
        # stress move
        assert not _material_variants(
            [("B", "AH0", "L", "OW1"), ("B", "L", "OW1")])
        # weak forms are excluded from the queue wholesale
        for w in ("the", "a", "and", "to", "of"):
            assert w in _WEAK_FORMS
        from tacotron2_tpu.text.analysis import heteronym_audit
        rep = heteronym_audit(["the cat and the hat go to the store"])
        assert all(m["word"] not in _WEAK_FORMS
                   for m in rep["top_candidate_misses"])
