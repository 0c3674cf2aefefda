"""Double Metaphone phonetic encoding (pure Python, from scratch).

Implements Lawrence Philips' Double Metaphone algorithm (C/C++ Users
Journal, June 2000 — public knowledge) to back the reference's
``InterDoubleMetaphoneConceptRecognizer`` (reference
claimskg/reconciler/recognizer/intersection_recognizers.py:13-158, which
keys its unigram concept index on ``doublemetaphone(token)[0]``).  That
recognizer is dead code in the reference generator path — only
``IntersStemConceptRecognizer`` is ever constructed
(skosthesaurusmatcher.py:68) — but implementing it completes the SURVEY
§2 inventory (P19) and gives PhraseMatcher a phonetic key mode.

Returns ``(primary, secondary)`` codes, un-truncated (like the PyPI
``metaphone`` package the reference imports, which drops the original
4-character cap).  Codes use the symbols A F H J K L M N P R S T X 0
('0' = th).  Engine-side the codes are computed once per distinct
dictionary/token unigram inside a broadcast closure — never per row on
the hot path.
"""

from typing import Tuple

_VOWELS = frozenset("AEIOUY")


def _is_vowel(st: str, pos: int) -> bool:
    return 0 <= pos < len(st) and st[pos] in _VOWELS


def _slavo_germanic(word: str) -> bool:
    return ("W" in word) or ("K" in word) or ("CZ" in word) or ("WITZ" in word)


def doublemetaphone(word: str) -> Tuple[str, str]:
    """Return the (primary, secondary) Double Metaphone codes of ``word``.

    Input may be any case; non-letter characters contribute nothing.
    ``doublemetaphone("smith") == ("SM0", "XMT")``.
    """
    original = word.upper()
    length = len(original)
    if length == 0:
        return "", ""
    last = length - 1
    # Pad so lookahead slices never raise; the original algorithm pads
    # with 5 spaces.
    st = original + "     "
    slavo = _slavo_germanic(original)

    primary = []
    secondary = []

    def add(pri: str, sec: str = None) -> None:
        primary.append(pri)
        secondary.append(pri if sec is None else sec)

    pos = 0
    # Skip a silent first letter: AGNES, KNIGHT, PNEUMONIA, WRIGHT, PSYCHO.
    if st[0:2] in ("GN", "KN", "PN", "WR", "PS"):
        pos = 1
    # Initial X is pronounced Z (e.g. XAVIER), which maps to S.
    elif st[0] == "X":
        add("S")
        pos = 1
    # All initial vowels map to A.
    elif st[0] in _VOWELS:
        add("A")
        pos = 1

    while pos < length:
        ch = st[pos]

        if ch in _VOWELS:
            pos += 1

        elif ch == "B":
            add("P")
            pos += 2 if st[pos + 1] == "B" else 1

        elif ch == "\xc7":  # Ç
            add("S")
            pos += 1

        elif ch == "C":
            # Germanic -ACH- (e.g. MACHER) but not CHIA/CHEMISTRY.
            if (
                pos > 1
                and not _is_vowel(st, pos - 2)
                and st[pos - 1 : pos + 2] == "ACH"
                and st[pos + 2] != "I"
                and (st[pos + 2] != "E" or st[pos - 2 : pos + 4] in ("BACHER", "MACHER"))
            ):
                add("K")
                pos += 2
            elif pos == 0 and st[0:6] == "CAESAR":
                add("S")
                pos += 2
            elif st[pos : pos + 4] == "CHIA":  # italian CHIANTI
                add("K")
                pos += 2
            elif st[pos : pos + 2] == "CH":
                if pos > 0 and st[pos : pos + 4] == "CHAE":  # MICHAEL
                    add("K", "X")
                    pos += 2
                elif (
                    pos == 0
                    and (
                        st[1:6] in ("HARAC", "HARIS")
                        or st[1:4] in ("HOR", "HYM", "HIA", "HEM")
                    )
                    and st[0:5] != "CHORE"
                ):
                    # Greek roots: CHARACTER, CHORUS, CHYMERA ...
                    add("K")
                    pos += 2
                elif (
                    st[0:4] in ("VAN ", "VON ")
                    or st[0:3] == "SCH"
                    or st[pos - 2 : pos + 4] in ("ORCHES", "ARCHIT", "ORCHID")
                    or st[pos + 2] in ("T", "S")
                    or (
                        (st[pos - 1] in "AOUE" or pos == 0)
                        and st[pos + 2] in "LRNMBHFVW "
                    )
                ):
                    # Germanic / greek / hard-CH contexts: K.
                    add("K")
                    pos += 2
                else:
                    if pos > 0:
                        if st[0:2] == "MC":  # e.g. MCHUGH
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                    pos += 2
            elif st[pos : pos + 2] == "CZ" and st[pos - 2 : pos + 2] != "WICZ":
                add("S", "X")
                pos += 2
            elif st[pos + 1 : pos + 4] == "CIA":  # FOCACCIA
                add("X")
                pos += 3
            elif st[pos : pos + 2] == "CC" and not (pos == 1 and st[0] == "M"):
                # Double C, but not McClellan.
                if st[pos + 2] in "IEH" and st[pos + 2 : pos + 4] != "HU":
                    if (pos == 1 and st[pos - 1] == "A") or st[
                        pos - 1 : pos + 5
                    ] in ("UCCEE", "UCCES"):
                        add("KS")  # ACCIDENT, SUCCEED
                    else:
                        add("X")  # BACCI, BERTUCCI
                    pos += 3
                else:
                    add("K")  # Pierce's rule
                    pos += 2
            elif st[pos : pos + 2] in ("CK", "CG", "CQ"):
                add("K")
                pos += 2
            elif st[pos : pos + 2] in ("CI", "CE", "CY"):
                if st[pos : pos + 3] in ("CIO", "CIE", "CIA"):
                    add("S", "X")  # italian vs english
                else:
                    add("S")
                pos += 2
            else:
                add("K")
                if st[pos + 1 : pos + 3] in (" C", " Q", " G"):
                    pos += 3  # Mac Caffrey, Mac Gregor
                elif st[pos + 1] in "CKQ" and st[pos + 1 : pos + 3] not in (
                    "CE",
                    "CI",
                ):
                    pos += 2
                else:
                    pos += 1

        elif ch == "D":
            if st[pos : pos + 2] == "DG":
                if st[pos + 2] in "IEY":
                    add("J")  # EDGE
                    pos += 3
                else:
                    add("TK")  # EDGAR
                    pos += 2
            elif st[pos : pos + 2] in ("DT", "DD"):
                add("T")
                pos += 2
            else:
                add("T")
                pos += 1

        elif ch == "F":
            add("F")
            pos += 2 if st[pos + 1] == "F" else 1

        elif ch == "G":
            if st[pos + 1] == "H":
                if pos > 0 and not _is_vowel(st, pos - 1):
                    add("K")  # e.g. GHOSLI... consonant+GH
                    pos += 2
                elif pos == 0:
                    if st[pos + 2] == "I":
                        add("J")  # GHISLANE
                    else:
                        add("K")  # GHOST
                    pos += 2
                elif (
                    (pos > 1 and st[pos - 2] in "BHD")
                    or (pos > 2 and st[pos - 3] in "BHD")
                    or (pos > 3 and st[pos - 4] in "BH")
                ):
                    # Silent GH: HUGH, BOUGH, BROUGHAM.
                    pos += 2
                else:
                    if pos > 2 and st[pos - 1] == "U" and st[pos - 3] in "CGLRT":
                        add("F")  # LAUGH, COUGH, ROUGH, TOUGH
                    elif pos > 0 and st[pos - 1] != "I":
                        add("K")
                    pos += 2
            elif st[pos + 1] == "N":
                if pos == 1 and _is_vowel(st, 0) and not slavo:
                    add("KN", "N")
                elif st[pos + 2 : pos + 4] != "EY" and st[pos + 1] != "Y" and not slavo:
                    add("N", "KN")  # e.g. CAGNEY
                else:
                    add("KN")
                pos += 2
            elif st[pos + 1 : pos + 3] == "LI" and not slavo:
                add("KL", "L")  # TAGLIARO
                pos += 2
            elif pos == 0 and (
                st[pos + 1] == "Y"
                or st[pos + 1 : pos + 3]
                in ("ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
            ):
                add("K", "J")  # GES-, GEP- etc: ambiguous initial G
                pos += 2
            elif (
                (st[pos + 1 : pos + 3] == "ER" or st[pos + 1] == "Y")
                and st[0:6] not in ("DANGER", "RANGER", "MANGER")
                and st[pos - 1] not in "EI"
                and st[pos - 1 : pos + 2] not in ("RGY", "OGY")
            ):
                add("K", "J")  # -GER-, -GY-
                pos += 2
            elif st[pos + 1] in "EIY" or st[pos - 1 : pos + 3] in ("AGGI", "OGGI"):
                if (
                    st[0:4] in ("VAN ", "VON ")
                    or st[0:3] == "SCH"
                    or st[pos + 1 : pos + 3] == "ET"
                ):
                    add("K")  # germanic
                elif st[pos + 1 : pos + 5] == "IER ":
                    add("J")  # -GIER
                else:
                    add("J", "K")
                pos += 2
            else:
                add("K")
                pos += 2 if st[pos + 1] == "G" else 1

        elif ch == "H":
            # Keep H only between vowels or at word start before a vowel.
            if (pos == 0 or _is_vowel(st, pos - 1)) and _is_vowel(st, pos + 1):
                add("H")
                pos += 2
            else:
                pos += 1

        elif ch == "J":
            if st[pos : pos + 4] == "JOSE" or st[0:4] == "SAN ":
                # Spanish: JOSE, SAN JACINTO.
                if (pos == 0 and st[pos + 4] == " ") or st[0:4] == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                pos += 1
            else:
                if pos == 0:
                    add("J", "A")  # JANKELOWICZ vs YANKELOWICZ
                elif (
                    _is_vowel(st, pos - 1)
                    and not slavo
                    and st[pos + 1] in "AO"
                ):
                    add("J", "H")  # BAJADOR
                elif pos == last:
                    add("J", " ")
                elif st[pos + 1] not in "LTKSNMBZ" and st[pos - 1] not in "SKL":
                    add("J")
                pos += 2 if st[pos + 1] == "J" else 1

        elif ch == "K":
            add("K")
            pos += 2 if st[pos + 1] == "K" else 1

        elif ch == "L":
            if st[pos + 1] == "L":
                # Spanish -ILLO/-ILLA/-ALLE: L is a Y sound in primary.
                if (
                    pos == length - 3
                    and st[pos - 1 : pos + 3] in ("ILLO", "ILLA", "ALLE")
                ) or (
                    (st[last - 1 : last + 1] in ("AS", "OS") or st[last] in "AO")
                    and st[pos - 1 : pos + 3] == "ALLE"
                ):
                    add("L", " ")
                    pos += 2
                else:
                    add("L")
                    pos += 2
            else:
                add("L")
                pos += 1

        elif ch == "M":
            add("M")
            if (
                st[pos - 1 : pos + 2] == "UMB"
                and (pos + 1 == last or st[pos + 2 : pos + 4] == "ER")
            ) or st[pos + 1] == "M":
                pos += 2  # DUMB, THUMB: silent B handled here
            else:
                pos += 1

        elif ch == "N":
            add("N")
            pos += 2 if st[pos + 1] == "N" else 1

        elif ch == "\xd1":  # Ñ
            add("N")
            pos += 1

        elif ch == "P":
            if st[pos + 1] == "H":
                add("F")
                pos += 2
            else:
                add("P")
                pos += 2 if st[pos + 1] in "PB" else 1

        elif ch == "Q":
            add("K")
            pos += 2 if st[pos + 1] == "Q" else 1

        elif ch == "R":
            # French -IER/-IER: terminal R is dropped in primary.
            if (
                pos == last
                and not slavo
                and st[pos - 2 : pos] == "IE"
                and st[pos - 4 : pos - 2] not in ("ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            pos += 2 if st[pos + 1] == "R" else 1

        elif ch == "S":
            if st[pos - 1 : pos + 2] in ("ISL", "YSL"):
                pos += 1  # silent: ISLAND, CARLYSLE
            elif pos == 0 and st[0:5] == "SUGAR":
                add("X", "S")
                pos += 1
            elif st[pos : pos + 2] == "SH":
                if st[pos + 1 : pos + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                pos += 2
            elif st[pos : pos + 3] in ("SIO", "SIA") or st[pos : pos + 4] == "SIAN":
                if not slavo:
                    add("S", "X")
                else:
                    add("S")
                pos += 3
            elif (pos == 0 and st[1] in "MNLW") or st[pos + 1] == "Z":
                # German/anglicization: SM-, SN-, SL-, SW-, -SZ-.
                add("S", "X")
                pos += 2 if st[pos + 1] == "Z" else 1
            elif st[pos : pos + 2] == "SC":
                if st[pos + 2] == "H":
                    if st[pos + 3 : pos + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                        if st[pos + 3 : pos + 5] in ("ER", "EN"):
                            add("X", "SK")  # SCHERMERHORN, SCHENKER
                        else:
                            add("SK")  # SCHOOL, SCHOONER
                    else:
                        if pos == 0 and not _is_vowel(st, 3) and st[3] != "W":
                            add("X", "S")
                        else:
                            add("X")
                elif st[pos + 2] in "IEY":
                    add("S")
                else:
                    add("SK")
                pos += 3
            else:
                if pos == last and st[pos - 2 : pos] in ("AI", "OI"):
                    add("", "S")  # french: ARTOIS
                else:
                    add("S")
                pos += 2 if st[pos + 1] in "SZ" else 1

        elif ch == "T":
            if st[pos : pos + 4] == "TION":
                add("X")
                pos += 3
            elif st[pos : pos + 3] in ("TIA", "TCH"):
                add("X")
                pos += 3
            elif st[pos : pos + 2] == "TH" or st[pos : pos + 3] == "TTH":
                if (
                    st[pos + 2 : pos + 4] in ("OM", "AM")
                    or st[0:4] in ("VAN ", "VON ")
                    or st[0:3] == "SCH"
                ):
                    add("T")  # THOMAS, germanic
                else:
                    add("0", "T")
                pos += 2
            else:
                add("T")
                pos += 2 if st[pos + 1] in "TD" else 1

        elif ch == "V":
            add("F")
            pos += 2 if st[pos + 1] == "V" else 1

        elif ch == "W":
            if st[pos : pos + 2] == "WR":
                add("R")
                pos += 2
            else:
                if pos == 0 and (_is_vowel(st, 1) or st[0:2] == "WH"):
                    if _is_vowel(st, 1):
                        add("A", "F")  # WASSERMAN vs VASSERMAN
                    else:
                        add("A")  # WH-: WHARTON
                if (
                    (pos == last and _is_vowel(st, pos - 1))
                    or st[pos - 1 : pos + 4] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or st[0:3] == "SCH"
                ):
                    add("", "F")  # polish -OWSKI etc.
                    pos += 1
                elif st[pos : pos + 4] in ("WICZ", "WITZ"):
                    add("TS", "FX")
                    pos += 4
                else:
                    pos += 1

        elif ch == "X":
            # French terminal -X is silent: BREAUX, CADEAUX.
            if not (
                pos == last
                and (
                    st[pos - 3 : pos] in ("IAU", "EAU")
                    or st[pos - 2 : pos] in ("AU", "OU")
                )
            ):
                add("KS")
            pos += 2 if st[pos + 1] in "CX" else 1

        elif ch == "Z":
            if st[pos + 1] == "H":
                add("J")  # chinese pinyin: ZHAO
                pos += 2
            else:
                if st[pos + 1 : pos + 3] in ("ZO", "ZI", "ZA") or (
                    slavo and pos > 0 and st[pos - 1] != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                pos += 2 if st[pos + 1] == "Z" else 1

        else:
            pos += 1

    # The Spanish-LL / terminal-J rules append a space sentinel (original
    # algorithm's truncation hack); codes never contain interior spaces.
    return "".join(primary).rstrip(), "".join(secondary).rstrip()


def metaphone_key(token: str) -> str:
    """Primary Double Metaphone code — the unigram index key used by the
    reference's ``InterDoubleMetaphoneConceptRecognizer``
    (intersection_recognizers.py:52,88: ``doublemetaphone(token)[0]``)."""
    return doublemetaphone(token)[0]
