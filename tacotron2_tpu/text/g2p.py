"""Grapheme-to-phoneme conversion.

Replaces the reference's `g2p_en.G2p` (reference: src/text.py:35,50) with a
dependency-free two-stage converter:

  1. lexicon lookup in CMUdict (covers virtually all LJSpeech vocabulary);
  2. a rule-based letter-to-sound (LTS) fallback for out-of-vocabulary
     words (g2p_en uses a small neural net here; a deterministic rule
     system keeps this framework self-contained — OOV words after
     normalization are rare).

Output convention matches g2p_en: a flat list of ARPAbet symbols with a
single ``' '`` token between words.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .homographs import disambiguate
from .lexicon import load_lexicon

# Ordered LTS rules: longest-match-first grapheme chunks -> phonemes.
# Deliberately simple; a fallback of last resort, not a linguistics engine.
_LTS_RULES: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("tion", ("SH", "AH0", "N")),
    ("sion", ("ZH", "AH0", "N")),
    ("ough", ("AO1",)),
    ("augh", ("AO1",)),
    ("eigh", ("EY1",)),
    ("igh", ("AY1",)),
    ("tch", ("CH",)),
    ("dge", ("JH",)),
    ("ch", ("CH",)),
    ("sh", ("SH",)),
    ("th", ("TH",)),
    ("ph", ("F",)),
    ("wh", ("W",)),
    ("ck", ("K",)),
    ("ng", ("NG",)),
    ("qu", ("K", "W")),
    ("oo", ("UW1",)),
    ("ee", ("IY1",)),
    ("ea", ("IY1",)),
    ("ai", ("EY1",)),
    ("ay", ("EY1",)),
    ("ei", ("EY1",)),
    ("ey", ("EY1",)),
    ("oa", ("OW1",)),
    ("ou", ("AW1",)),
    ("ow", ("OW1",)),
    ("oi", ("OY1",)),
    ("oy", ("OY1",)),
    ("au", ("AO1",)),
    ("aw", ("AO1",)),
    ("ar", ("AA1", "R")),
    ("or", ("AO1", "R")),
    ("er", ("ER0",)),
    ("ir", ("ER1",)),
    ("ur", ("ER1",)),
    ("ce", ("S",)),
    ("ge", ("JH",)),
    ("a", ("AE1",)),
    ("b", ("B",)),
    ("c", ("K",)),
    ("d", ("D",)),
    ("e", ("EH1",)),
    ("f", ("F",)),
    ("g", ("G",)),
    ("h", ("HH",)),
    ("i", ("IH1",)),
    ("j", ("JH",)),
    ("k", ("K",)),
    ("l", ("L",)),
    ("m", ("M",)),
    ("n", ("N",)),
    ("o", ("AA1",)),
    ("p", ("P",)),
    ("q", ("K",)),
    ("r", ("R",)),
    ("s", ("S",)),
    ("t", ("T",)),
    ("u", ("AH1",)),
    ("v", ("V",)),
    ("w", ("W",)),
    ("x", ("K", "S")),
    ("y", ("Y",)),
    ("z", ("Z",)),
)


def letter_to_sound(word: str) -> List[str]:
    """Rule-based fallback pronunciation for an OOV word."""
    word = word.lower()
    # Drop a silent final 'e' on words longer than 3 chars ("blake" -> blak).
    if len(word) > 3 and word.endswith("e") and word[-2] not in "aeiou":
        word = word[:-1]
    phones: List[str] = []
    i = 0
    n = len(word)
    while i < n:
        for chunk, ph in _LTS_RULES:
            if word.startswith(chunk, i):
                phones.extend(ph)
                i += len(chunk)
                break
        else:
            i += 1  # unknown character (digit/underscore): skip
    return phones


# Voicing-dependent suffix realizations (standard English morphophonology,
# matching the CMUdict pronunciations of inflected forms).
_VOICELESS = {"P", "T", "K", "F", "TH"}
_SIBILANT = {"S", "Z", "SH", "ZH", "CH", "JH"}


def _plural_suffix(stem_phones: Sequence[str]) -> Tuple[str, ...]:
    """-s / -es / -'s: /IH0 Z/ after sibilants, /S/ after voiceless, /Z/."""
    last = stem_phones[-1] if stem_phones else ""
    if last in _SIBILANT:
        return ("IH0", "Z")
    if last in _VOICELESS:
        return ("S",)
    return ("Z",)


def _past_suffix(stem_phones: Sequence[str]) -> Tuple[str, ...]:
    """-ed: /IH0 D/ after T or D, /T/ after voiceless, /D/ otherwise."""
    last = stem_phones[-1] if stem_phones else ""
    if last in ("T", "D"):
        return ("IH0", "D")
    if last in (_VOICELESS | _SIBILANT) - {"Z", "ZH", "JH"} - {"D"}:
        # voiceless obstruents (incl. S, SH, CH) devoice the suffix
        return ("T",)
    return ("D",)


class G2p:
    """Word-sequence to phoneme-sequence converter.

    Callable on a normalized text string (lowercase words separated by
    single spaces); returns a flat symbol list with ``' '`` separators,
    mirroring ``g2p_en.G2p.__call__`` output format.

    Resolution order (each stage only fires if the previous missed):
      0. heteronym disambiguation (context-sensitive, ``__call__`` only) —
         the counterpart of g2p_en's POS-tagged homograph lexicon, using
         deterministic previous-word cues (homographs.py);
      1. direct lexicon lookup;
      2. apostrophe restoration — the normalizer strips apostrophes
         ("don't" -> "dont", reference: src/text.py:24-26), but CMUdict
         keys keep them, so contractions re-insert ' before n't/'s/'re/
         've/'ll/'d and retry;
      3. regular morphology — plural/possessive -s/-es, past -ed,
         progressive -ing, adverbial -ly built from a lexicon stem with
         the voicing-correct suffix phonemes (covers the biggest OOV
         class: inflected forms CMUdict lists only as stems);
      4. rule LTS as the last resort.

    Known divergence from the reference's g2p_en: heteronym choice uses
    rule cues instead of a statistical POS tagger, and pairs POS cannot
    separate ("bass" fish/music) take CMUdict's first variant.  See
    tests/test_text.py::TestG2pDivergences / TestHomographs.
    """

    def __init__(self, lexicon: Optional[Dict[str, Tuple[str, ...]]] = None,
                 lexicon_path: Optional[str] = None,
                 homographs: bool = True):
        self._lexicon = lexicon if lexicon is not None else load_lexicon(lexicon_path)
        self._homographs = homographs

    def _lookup(self, word: str) -> Optional[Tuple[str, ...]]:
        return self._lexicon.get(word)

    def _apostrophe_restore(self, word: str) -> Optional[Tuple[str, ...]]:
        cands = []
        if word.endswith("nt") and len(word) > 3:
            cands.append(word[:-2] + "n't")
        for suf in ("s", "re", "ve", "ll", "d", "m"):
            if word.endswith(suf) and len(word) > len(suf):
                cands.append(word[: -len(suf)] + "'" + suf)
        if word.startswith("o") and len(word) > 3:
            cands.append("o'" + word[1:])     # oclock -> o'clock
        for c in cands:
            hit = self._lookup(c)
            if hit is not None:
                return hit
        return None

    def _compound(self, word: str) -> Optional[Tuple[str, ...]]:
        """Split an OOV into two lexicon words (longest first part wins):
        "woodcutters" -> wood + cutters.  Both halves must be ≥3 letters
        so short function words don't produce junk splits."""
        for i in range(len(word) - 3, 2, -1):
            a, b = self._lookup(word[:i]), self._lookup(word[i:])
            if a is not None and b is not None:
                return tuple(a) + tuple(b)
        return None

    def _stem_candidates(self, word: str, suffix_len: int) -> List[str]:
        stem = word[:-suffix_len]
        cands = [stem, stem + "e"]            # walk(ed), lov(ed)->love
        if len(stem) > 2 and stem[-1] == stem[-2]:
            cands.append(stem[:-1])           # stopp(ed)->stop
        if stem.endswith("i"):
            cands.append(stem[:-1] + "y")     # carri(ed)->carry
        return cands

    def _morphology(self, word: str) -> Optional[Tuple[str, ...]]:
        # plural / possessive / 3rd-person -s, -es
        if word.endswith("s") and not word.endswith("ss") and len(word) > 3:
            for n in (1, 2) if word.endswith("es") else (1,):
                for stem in ([word[:-n]] if n == 1
                             else self._stem_candidates(word, n)):
                    ph = self._lookup(stem)
                    if ph is not None:
                        return tuple(ph) + _plural_suffix(ph)
        if word.endswith("ed") and len(word) > 4:
            for stem in self._stem_candidates(word, 2):
                ph = self._lookup(stem)
                if ph is not None:
                    return tuple(ph) + _past_suffix(ph)
        if word.endswith("ing") and len(word) > 5:
            for stem in self._stem_candidates(word, 3):
                ph = self._lookup(stem)
                if ph is not None:
                    return tuple(ph) + ("IH0", "NG")
        if word.endswith("ly") and len(word) > 4:
            ph = self._lookup(word[:-2])
            if ph is not None:
                return tuple(ph) + ("L", "IY0")
        return None

    def pronounce(self, word: str) -> Sequence[str]:
        """Context-free pronunciation (heteronyms take their default
        reading; use ``__call__``/``pronounce_in_context`` for cue-driven
        heteronym choice)."""
        return self.pronounce_in_context(word, prev=None)

    def pronounce_in_context(self, word: str,
                             prev: Optional[str] = None) -> Sequence[str]:
        word = word.lower()
        if self._homographs:
            hit = disambiguate(word, prev.lower() if prev else None)
            if hit is not None:
                return hit
        for resolver in (self._lookup, self._apostrophe_restore,
                         self._morphology, self._compound):
            entry = resolver(word)
            if entry is not None:
                return entry
        return letter_to_sound(word)

    def resolution(self, word: str) -> str:
        """Which stage resolves ``word`` — for coverage reporting."""
        word = word.lower()
        for name, resolver in (("lexicon", self._lookup),
                               ("apostrophe", self._apostrophe_restore),
                               ("morphology", self._morphology),
                               ("compound", self._compound)):
            if resolver(word) is not None:
                return name
        return "lts"

    def __call__(self, text: str) -> List[str]:
        words = text.split()
        out: List[str] = []
        for i, word in enumerate(words):
            if i > 0:
                out.append(' ')
            out.extend(self.pronounce_in_context(
                word, prev=words[i - 1] if i > 0 else None))
        return out
