#!/usr/bin/env python3
"""Check decoder scaladoc CLAIMS against the code (stale-doc detector).

Usage: claimscheck.py [repo_root]     # exit 0 clean, 1 findings
       claimscheck.py --selftest      # pin every check class (good + bad)

Mechanizes the decoder-header claims sweep that found three stale-scaladoc
bugs by hand across r13-r14 (Jpeg header claimed SOF2 rejected while the
decoder implements it; Png header listed palette both supported and
rejected; Multimodal header said six decoder families when eight are real).
Each check grounds a doc claim in something the code itself asserts, so the
two can no longer drift silently:

1. count-words: a number word within reach of "decoder famil(y|ies)", and
   any FMT/FMT/.../FMT slash-list tagged "all real", must equal the real
   decoder-family count — the `def decode<Fmt>(docId:` entry points
   actually defined under operators/.
2. scope self-contradiction: a feature token (palette, alpha, progressive,
   ...) appearing BOTH in a rejected-clause subject and in the supported
   remainder of the same header. Subjects are found by walking back from
   rejection markers to the enclosing sentence/parenthesis, so an inner
   "(... out-of-range indices rejected)" aside does not poison the scope
   sentence around it; "non-X" never counts as a claim about X.
3. Jpeg SOF set: the header's rejected SOFn list (ranges expanded) must
   equal the decoder's rejection `case 0xc3 | ... => return None` arm, and
   no header-supported SOFn may be code-rejected.
4. baseline-only phrasing ("baseline JPEG/JFIF" with no "progressive" in
   the sentence) anywhere in the decoder docs or README while the code
   carries the progressive state machine.
"""
import re
import sys
import os

DECODER_FILES = ["Multimodal.scala", "Jpeg.scala", "Png.scala",
                 "Flac.scala", "Gif.scala"]
NUMWORDS = {w: i for i, w in enumerate(
    "zero one two three four five six seven eight nine ten eleven twelve"
    .split())}
VOCAB = ["progressive", "palette", "alpha", "arithmetic", "lossless",
         "hierarchical", "interlac", "adam7", "stereo", "transparency",
         "grayscale", "greyscale", "truecolor", "16-bit", "8-bit", "lzw"]
REJECT = re.compile(
    r"\brejected\b|\bout of scope\b|\bunsupported\b|\bnot supported\b"
    r"|\bneeds? a third-party\b", re.I)


def doc_blocks(src: str) -> list:
    """All /** ... */ blocks, continuation stars stripped, one line each."""
    out = []
    for m in re.finditer(r"/\*\*(.*?)\*/", src, re.S):
        lines = [re.sub(r"^\s*\*\s?", "", l) for l in m.group(1).split("\n")]
        out.append(re.sub(r"\s+", " ", " ".join(lines)).strip())
    return out


def reject_subjects(text: str) -> list:
    """Subject segment of each rejection clause: walk back from the marker
    to the nearest sentence boundary, or to an UNCLOSED '(' (so a balanced
    parenthetical between boundary and marker stays in the subject, while a
    marker INSIDE a parenthetical claims only that parenthetical)."""
    subjects = []
    for m in REJECT.finditer(text):
        i, depth = m.start() - 1, 0
        while i > 0:
            c = text[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    break
                depth -= 1
            elif c == "." and i + 1 < len(text) and text[i + 1] == " ":
                break
            i -= 1
        subjects.append((max(i, 0), m.start(), text[max(i, 0):m.start()]))
    return subjects


def vocab_tokens(region: str) -> set:
    """Vocabulary tokens present in the region; 'non-X' is a claim about
    the complement of X, never about X."""
    toks, low = set(), region.lower()
    for v in VOCAB:
        for m in re.finditer(re.escape(v), low):
            if not low[max(0, m.start() - 4):m.start()].endswith("non-"):
                toks.add(v)
                break
    return toks


def check_contradiction(header: str) -> list:
    subjects = reject_subjects(header)
    rej = set()
    for _, _, subj in subjects:
        rej |= vocab_tokens(subj)
    support = list(header)
    for a, b, _ in subjects:
        support[a:b] = " " * (b - a)
    sup = vocab_tokens("".join(support))
    return [f"'{t}' is claimed both supported and rejected in the same header"
            for t in sorted(rej & sup)]


def expand_sofs(text: str) -> set:
    s = set()
    for m in re.finditer(r"SOF(\d+)(?:\s*[–-]\s*SOF(\d+))?", text):
        a, b = int(m.group(1)), int(m.group(2) or m.group(1))
        s.update(range(a, b + 1))
    return s


def check_sof_set(header: str, code: str) -> list:
    arm = re.search(
        r"case ((?:0x[cC][0-9a-fA-F]\s*\|\s*)+0x[cC][0-9a-fA-F])\s*=>"
        r"\s*return None", code)
    if not arm:
        return ["no SOF rejection case arm found in the decoder"]
    code_rej = {int(h, 16) - 0xC0 for h in re.findall(r"0x[cC][0-9a-fA-F]",
                                                      arm.group(1))}
    hdr_rej = set()
    for _, _, subj in reject_subjects(header):
        hdr_rej |= expand_sofs(subj)
    hdr_sup = expand_sofs(header) - hdr_rej
    out = []
    if hdr_rej != code_rej:
        out.append(f"header-rejected SOFs {sorted(hdr_rej)} != "
                   f"code-rejected {sorted(code_rej)}")
    bad = sorted(hdr_sup & code_rej)
    if bad:
        out.append(f"header claims SOF{bad} supported but the code rejects them")
    return out


def real_family_count(ops_dir: str) -> int:
    names = set()
    for f in os.listdir(ops_dir):
        if f.endswith(".scala"):
            src = open(os.path.join(ops_dir, f)).read()
            names |= set(re.findall(r"def (decode[A-Z]\w*)\(docId:", src))
    return len(names)


def check_counts(doc: str, truth: int) -> list:
    out = []
    for m in re.finditer(r"\b(" + "|".join(NUMWORDS) + r")\b"
                         r"(?=[^.]{0,80}decoder famil)", doc, re.I):
        n = NUMWORDS[m.group(1).lower()]
        if n != truth:
            out.append(f"says '{m.group(1)}' decoder families; code has {truth}")
    for m in re.finditer(r"\b([A-Za-z0-9-]+(?:/[A-Za-z0-9-]+){2,}) all real",
                         doc):
        n = len(m.group(1).split("/"))
        if n != truth:
            out.append(f"'{m.group(1)} all real' lists {n}; code has {truth}")
    return out


def check_baseline_phrase(text: str, progressive_in_code: bool) -> list:
    if not progressive_in_code:
        return []
    out = []
    for m in re.finditer(r"[Bb]aseline(?:-only)? (?:JPEG|JFIF)[/\w]*", text):
        start = text.rfind(". ", 0, m.start()) + 1
        end = text.find(". ", m.end())
        sentence = text[start:end if end != -1 else len(text)]
        if "progressive" not in sentence.lower():
            out.append(f"'{m.group(0)}' phrasing but the decoder implements "
                       "progressive (name both or neither)")
    return out


def run(root: str) -> int:
    ops = os.path.join(root, "src/main/scala/graft/operators")
    truth = real_family_count(ops)
    jpeg_code = open(os.path.join(ops, "Jpeg.scala")).read()
    progressive = "ProgState" in jpeg_code
    findings = []
    for f in DECODER_FILES:
        path = os.path.join(ops, f)
        src = open(path).read()
        docs = doc_blocks(src)
        if docs:
            for msg in check_contradiction(docs[0]):
                findings.append((path, msg))
        if f == "Jpeg.scala" and docs:
            for msg in check_sof_set(docs[0], src):
                findings.append((path, msg))
        for d in docs:
            for msg in check_counts(d, truth):
                findings.append((path, msg))
            for msg in check_baseline_phrase(d, progressive):
                findings.append((path, msg))
    readme = os.path.join(root, "README.md")
    if os.path.exists(readme):
        text = re.sub(r"\s+", " ", open(readme).read())
        for msg in check_counts(text, truth):
            findings.append((readme, msg))
        for msg in check_baseline_phrase(text, progressive):
            findings.append((readme, msg))
    for path, msg in findings:
        print(f"STALE {os.path.relpath(path, root)}: {msg}")
    print(f"\n{len(findings)} stale claim(s); decoder-family ground truth = {truth}")
    return 1 if findings else 0


def selftest() -> int:
    # each historical bug class gets its red case and its fixed green case
    png_bad = ("Scope: 8-bit greyscale (color type 0), truecolor RGB (type "
               "2), and palette-indexed (type 3, PLTE lookup with "
               "out-of-range indices rejected), non-interlaced AND "
               "Adam7-interlaced (certified). Palette/alpha/16-bit are "
               "rejected -> dead-letter.")
    png_good = png_bad.replace("Palette/alpha/16-bit",
                               "Alpha color types (4, 6) and non-8-bit depths")
    jpeg_hdr_good = ("Decoder scope: baseline (SOF0/SOF1) AND progressive "
                     "(SOF2), 8-bit. Arithmetic-coded (SOF9–SOF11, "
                     "SOF13–SOF15) and lossless/hierarchical (SOF3, "
                     "SOF5–SOF7) modes are the rejected set.")
    jpeg_hdr_bad = ("Decoder scope: baseline (SOF0/SOF1), 8-bit. Progressive "
                    "(SOF2), arithmetic (SOF9–SOF11, SOF13–SOF15) "
                    "and lossless/hierarchical (SOF3, SOF5–SOF7) modes "
                    "are the rejected set.")
    jpeg_code = ("case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | "
                 "0xcd | 0xce | 0xcf =>\n            return None // out of scope")
    cases = [
        ("png contradiction red", check_contradiction(png_bad), True),
        ("png contradiction green", check_contradiction(png_good), False),
        ("inner-paren aside stays scoped",
         [f for f in check_contradiction(png_good) if "palette" in f], False),
        ("sof stale-reject red", check_sof_set(jpeg_hdr_bad, jpeg_code), True),
        ("sof sets green", check_sof_set(jpeg_hdr_good, jpeg_code), False),
        ("count-word red", check_counts("six real decoder families", 8), True),
        ("count-word green", check_counts("the eight real decoder families do", 8),
         False),
        ("slash-list red", check_counts("with A/B/C all real, this stub", 8), True),
        ("slash-list green",
         check_counts("with A/B/C/D/E/F/G/H all real, this stub", 8), False),
        ("baseline-phrase red",
         check_baseline_phrase("Baseline JPEG/JFIF codec - pure Scala.", True),
         True),
        ("baseline-phrase green", check_baseline_phrase(
            "JPEG/JFIF codec, baseline + progressive. ", True), False),
    ]
    failures = 0
    for label, got, want_findings in cases:
        ok = bool(got) == want_findings
        failures += not ok
        print(f"{'OK  ' if ok else 'FAIL'} {label}: {got if got else 'clean'}")
    print(f"\nselftest: {'PASS' if not failures else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(run(sys.argv[1] if len(sys.argv) > 1 else
                 os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
