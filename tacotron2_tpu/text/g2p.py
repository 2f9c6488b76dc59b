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


class G2p:
    """Word-sequence to phoneme-sequence converter.

    Callable on a normalized text string (lowercase words separated by
    single spaces); returns a flat symbol list with ``' '`` separators,
    mirroring ``g2p_en.G2p.__call__`` output format.
    """

    def __init__(self, lexicon: Optional[Dict[str, Tuple[str, ...]]] = None,
                 lexicon_path: Optional[str] = None):
        self._lexicon = lexicon if lexicon is not None else load_lexicon(lexicon_path)

    def pronounce(self, word: str) -> Sequence[str]:
        entry = self._lexicon.get(word.lower())
        if entry is not None:
            return entry
        return letter_to_sound(word)

    def __call__(self, text: str) -> List[str]:
        out: List[str] = []
        for i, word in enumerate(text.split()):
            if i > 0:
                out.append(' ')
            out.extend(self.pronounce(word))
        return out
