"""Phonetic matching functions (fuzzystrmatch parity).

The reference exposes PostgreSQL's fuzzystrmatch extension inside Cypher
(regress/sql/fuzzystrmatch.sql): soundex, levenshtein, difference,
metaphone, dmetaphone. soundex/levenshtein map to Spark built-ins (the
external-function fallthrough reaches them; values verified identical),
and difference is a pure-Column positional compare of soundex codes.
metaphone has no JVM-side equivalent, so this module carries a pure-Python
implementation of Lawrence Philips' original Metaphone algorithm (Computer
Language 7(12), 1990 — the same published rule set fuzzystrmatch's
metaphone.c implements), applied through an Arrow-batched pandas UDF.

Conformance: tests/test_fuzzystrmatch.py pins the reference fixture's
expected codes (expected/fuzzystrmatch.out).
"""

from __future__ import annotations

VOWELS = "AEIOU"
FRONT = "EIY"  # letters that soften C/G


def metaphone(word: str | None, maxlen: int = 255) -> str | None:
    """Original Metaphone code of ``word``, truncated to ``maxlen``."""
    if word is None:
        return None
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return ""

    # initial-letter exceptions
    if len(w) >= 2 and w[:2] in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif len(w) >= 2 and w[:2] == "WH":
        w = "W" + w[2:]

    out: list[str] = []
    n = len(w)
    i = 0
    while i < n and len(out) < maxlen:
        c = w[i]
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""

        # duplicate adjacent letters code once (except C: ACCEPT keeps both)
        if c == prev and c != "C":
            i += 1
            continue

        if c in VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            # silent at word end after M (DUMB, THUMB)
            if not (prev == "M" and i == n - 1):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":  # -CIA- -> X
                out.append("X")
            elif nxt == "H":
                # -SCH- hard (SCHOOL -> K); otherwise CH -> X
                out.append("K" if prev == "S" else "X")
            elif nxt in FRONT:
                if prev != "S":  # -SCE/I/Y-: the C is silent (SCIENCE)
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in FRONT:  # -DGE/I/Y- -> J, G consumed
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c == "F":
            out.append("F")
        elif c == "G":
            if nxt == "H":
                # GH silent unless before a vowel or at word start handled
                # by the general rule: code K only when the H leads a vowel
                if nxt2 in VOWELS:
                    out.append("K")
                    i += 1  # the H is consumed with the G
                # else silent (NIGHT, WEIGH)
            elif nxt == "N":
                # -GN-, -GNED: silent (GNASH handled by the initial rule)
                pass
            elif nxt in FRONT:
                if prev != "G":  # second G of GG codes hard (SUGGEST)
                    out.append("J")
                else:
                    out.append("K")
            else:
                out.append("K")
        elif c == "H":
            # silent after a vowel with no vowel following (AH, OH),
            # and after the digraph consumers below
            if prev in VOWELS and nxt not in VOWELS:
                pass
            elif prev in "CSPTG":
                pass  # handled by the digraph rules of those letters
            else:
                out.append("H")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if prev != "C":  # silent after C (BACK)
                out.append("K")
        elif c in ("L", "M", "N", "R"):
            out.append(c)
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in ("O", "A"):  # -SIO-, -SIA- -> X
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nxt2 in ("O", "A"):  # -TIO-, -TIA- -> X
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta (THOMAS -> TMS exceptions aside)
                i += 1
            elif nxt == "C" and nxt2 == "H":
                pass  # -TCH-: T silent (CATCH)
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in VOWELS:
                out.append("W")
            # else silent
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Y":
            if nxt in VOWELS:
                out.append("Y")
            # else silent
        elif c == "Z":
            out.append("S")
        i += 1

    return "".join(out[:maxlen])


# ---- Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000) ----
# fuzzystrmatch's dmetaphone()/dmetaphone_alt() implement this algorithm;
# the port below follows the published rule set. The dominant rule groups
# (initial exceptions, C/CH/CC, G/GH/GN, J, S/SH/SC, T/TH/TIO, W, X, Z,
# Slavo-Germanic switches) are complete; a handful of very narrow
# etymological look-ups (e.g. proper-noun exception lists) follow the
# published description as closely as practical.

_DM_VOWELS = "AEIOUY"


def _sg(w: str) -> bool:
    """Slavo-Germanic heuristic: W, K, CZ or WITZ anywhere."""
    return "W" in w or "K" in w or "CZ" in w or "WITZ" in w


def double_metaphone(word: str | None, maxlen: int = 4) -> tuple[str, str] | None:
    if word is None:
        return None
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    n = len(w)
    if n == 0:
        return ("", "")
    sg = _sg(w)
    pri: list[str] = []
    alt: list[str] = []

    def add(p: str, a: str | None = None):
        pri.append(p)
        alt.append(p if a is None else a)

    def at(i: int) -> str:
        return w[i] if 0 <= i < n else ""

    def match(i: int, *opts: str) -> bool:
        return any(w[i : i + len(o)] == o for o in opts)

    i = 0
    # initial exceptions
    if match(0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    elif at(0) == "X":
        add("S")
        i = 1
    elif at(0) in _DM_VOWELS:
        add("A")
        i = 1

    while i < n and (len(pri) < maxlen or len(alt) < maxlen):
        c = at(i)
        if c in _DM_VOWELS:
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if at(i + 1) == "B" else 1
        elif c == "C":
            if i > 1 and at(i - 2) not in _DM_VOWELS and match(i - 1, "ACH") and (
                at(i + 2) != "I" and (at(i + 2) != "E" or match(i - 2, "BACHER", "MACHER"))
            ):
                add("K")  # germanic -ACH-
                i += 2
            elif i == 0 and match(i, "CAESAR"):
                add("S")
                i += 2
            elif match(i, "CHIA"):
                add("K")
                i += 2
            elif match(i, "CH"):
                if i > 0 and match(i, "CHAE"):
                    add("K", "X")
                elif i == 0 and (
                    match(i + 1, "HARAC", "HARIS", "HOR", "HYM", "HIA", "HEM")
                ) and not match(0, "CHORE"):
                    add("K")  # greek roots
                elif (
                    match(0, "VAN ", "VON ") or match(0, "SCH")
                    or match(i - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or at(i + 2) in "TS"
                    or ((at(i - 1) in "AOUE" or i == 0) and at(i + 2) in "LRNMBHFVW ")
                ):
                    add("K")
                else:
                    if i > 0:
                        if match(0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif match(i, "CZ") and not match(i - 2, "WICZ"):
                add("S", "X")
                i += 2
            elif match(i + 1, "CIA"):
                add("X")
                i += 3
            elif match(i, "CC") and not (i == 1 and at(0) == "M"):
                if at(i + 2) in "IEH" and not match(i + 2, "HU"):
                    if (i == 1 and at(0) == "A") or match(i - 1, "UCCEE", "UCCES"):
                        add("K")
                        add("S")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif match(i, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif match(i, "CI", "CE", "CY"):
                if match(i, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if match(i + 1, " C", " Q", " G"):
                    i += 3
                elif at(i + 1) in "CKQ" and not match(i + 1, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if match(i, "DG"):
                if at(i + 2) in "IEY":
                    add("J")  # edge
                    i += 3
                else:
                    add("T")
                    add("K")
                    i += 2
            elif match(i, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if at(i + 1) == "F" else 1
        elif c == "G":
            if at(i + 1) == "H":
                if i > 0 and at(i - 1) not in _DM_VOWELS:
                    add("K")
                elif i == 0:
                    if at(i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                elif (
                    (i > 1 and at(i - 2) in "BHD")
                    or (i > 2 and at(i - 3) in "BHD")
                    or (i > 3 and at(i - 4) in "BH")
                ):
                    pass  # silent (HUGH, ...)
                else:
                    if i > 2 and at(i - 1) == "U" and at(i - 3) in "CGLRT":
                        add("F")  # laugh, cough
                    elif i > 0 and at(i - 1) != "I":
                        add("K")
                i += 2
            elif at(i + 1) == "N":
                if i == 1 and at(0) in _DM_VOWELS and not sg:
                    add("KN", "N")
                elif not match(i + 2, "EY") and at(i + 1) != "Y" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif match(i + 1, "LI") and not sg:
                add("KL", "L")
                i += 2
            elif i == 0 and (at(i + 1) == "Y" or match(i + 1, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
            elif (match(i + 1, "ER") or at(i + 1) == "Y") and not match(0, "DANGER", "RANGER", "MANGER") and at(i - 1) not in "EI" and not match(i - 1, "RGY", "OGY"):
                add("K", "J")
                i += 2
            elif at(i + 1) in "EIY" or match(i - 1, "AGGI", "OGGI"):
                if match(0, "VAN ", "VON ") or match(0, "SCH") or match(i + 1, "ET"):
                    add("K")
                elif match(i + 1, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if at(i + 1) == "G" else 1
        elif c == "H":
            if (i == 0 or at(i - 1) in _DM_VOWELS) and at(i + 1) in _DM_VOWELS:
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if match(i, "JOSE") or match(0, "SAN "):
                if (i == 0 and (at(i + 4) == " " or n == 4)) or match(0, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
            else:
                if i == 0 and not match(i, "JOSE"):
                    add("J", "A")
                elif at(i - 1) in _DM_VOWELS and not sg and at(i + 1) in "AO":
                    add("J", "H")
                elif i == n - 1:
                    add("J", "")
                elif at(i + 1) not in "LTKSNMBZ" and at(i - 1) not in "SKL":
                    add("J")
                i += 2 if at(i + 1) == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if at(i + 1) == "K" else 1
        elif c == "L":
            if at(i + 1) == "L":
                # spanish 'LL' endings: alternate drops it
                if (i == n - 3 and match(i - 1, "ILLO", "ILLA", "ALLE")) or (
                    (match(n - 2, "AS", "OS") or at(n - 1) in "AO") and match(i - 1, "ALLE")
                ):
                    add("L", "")
                    i += 2
                    continue
                add("L")
                i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if (match(i - 1, "UMB") and (i + 1 == n - 1 or match(i + 2, "ER"))) or at(i + 1) == "M":
                i += 2
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if at(i + 1) == "N" else 1
        elif c == "P":
            if at(i + 1) == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if at(i + 1) in "PB" else 1
        elif c == "Q":
            add("K")
            i += 2 if at(i + 1) == "Q" else 1
        elif c == "R":
            # french final -IER/-RE: alternate drops the R
            if i == n - 1 and not sg and match(i - 2, "IER") and not match(i - 4, "ME", "MA"):
                add("", "R")
            else:
                add("R")
            i += 2 if at(i + 1) == "R" else 1
        elif c == "S":
            if match(i - 1, "ISL", "YSL"):
                i += 1  # silent (island)
            elif i == 0 and match(i, "SUGAR"):
                add("X", "S")
                i += 1
            elif match(i, "SH"):
                if match(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                i += 2
            elif match(i, "SIO", "SIA") or match(i, "SIAN"):
                add("S", "X" if not sg else "S")
                i += 3
            elif (i == 0 and at(i + 1) in "MNLW") or at(i + 1) == "Z":
                add("S", "X")
                i += 2 if at(i + 1) == "Z" else 1
            elif match(i, "SC"):
                if at(i + 2) == "H":
                    if match(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if match(i + 3, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and at(3) not in _DM_VOWELS and at(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                elif at(i + 2) in "IEY":
                    add("S")
                    i += 3
                else:
                    add("SK")
                    i += 3
            else:
                if i == n - 1 and match(i - 2, "AIS", "OIS"):
                    add("", "S")  # french final
                else:
                    add("S")
                i += 2 if at(i + 1) in "SZ" else 1
        elif c == "T":
            if match(i, "TION") or match(i, "TIA", "TCH"):
                if match(i, "TCH"):
                    add("X")
                    i += 3
                else:
                    add("X")
                    i += 3
            elif match(i, "TH") or match(i, "TTH"):
                if match(i + 2, "OM", "AM") or match(0, "VAN ", "VON ") or match(0, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if at(i + 1) in "TD" else 1
        elif c == "V":
            add("F")
            i += 2 if at(i + 1) == "V" else 1
        elif c == "W":
            if match(i, "WR"):
                add("R")
                i += 2
            else:
                if i == 0 and (at(i + 1) in _DM_VOWELS or at(i + 1) == "H"):
                    if at(i + 1) in _DM_VOWELS:
                        add("A", "F")
                    else:
                        add("A")
                if (i == n - 1 and at(i - 1) in _DM_VOWELS) or match(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY") or match(0, "SCH"):
                    add("", "F")
                    i += 1
                elif match(i, "WICZ", "WITZ"):
                    add("TS", "FX")
                    i += 4
                else:
                    i += 1
        elif c == "X":
            if not (i == n - 1 and (match(i - 3, "IAU", "EAU") or match(i - 2, "AU", "OU"))):
                add("KS")  # not french final
            i += 2 if at(i + 1) in "CX" else 1
        elif c == "Z":
            if at(i + 1) == "H":
                add("J")  # chinese pinyin
                i += 2
            else:
                if match(i + 1, "ZO", "ZI", "ZA") or (sg and i > 0 and at(i - 1) != "T"):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if at(i + 1) == "Z" else 1
        else:
            i += 1

    return ("".join(pri)[:maxlen], "".join(alt)[:maxlen])


def dmetaphone(word: str | None) -> str | None:
    """Primary Double Metaphone code — fuzzystrmatch's dmetaphone()."""
    r = double_metaphone(word)
    return None if r is None else r[0]


def dmetaphone_alt(word: str | None) -> str | None:
    """Alternate Double Metaphone code — fuzzystrmatch's dmetaphone_alt()."""
    r = double_metaphone(word)
    return None if r is None else r[1]
