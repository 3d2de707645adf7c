"""Build per-speaker audio lists for extraction.

Rebuild of reference scripts/prepare_audio_list.py:63-359: scan speaker
directories (wav + sibling transcript file), emit
``audio_list/{speaker}.list`` with ``abs_path<TAB>text`` lines, optionally
split into parts for parallel extraction.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import List, Tuple


def scan_speaker_dirs(base_dir: Path) -> List[Path]:
    """Directories directly containing wavs, one speaker per dir."""
    out = []
    for sub in sorted(p for p in base_dir.iterdir() if p.is_dir()):
        if any(sub.glob("*.wav")):
            out.append(sub)
        else:
            for nested in sorted(p for p in sub.iterdir() if p.is_dir()):
                if any(nested.glob("*.wav")):
                    out.append(nested)
    return out


def prepare_single_speaker(data_dir: Path, text_suffix: str = ".txt"
                            ) -> Tuple[List[str], int, int]:
    entries, missing = [], 0
    for wav in sorted(data_dir.rglob("*.wav")):
        txt = wav.with_suffix(text_suffix)
        if not txt.exists():
            missing += 1
            continue
        text = txt.read_text(encoding="utf-8").strip()
        if text:
            entries.append(f"{wav.resolve()}\t{text}")
    return entries, len(entries), missing


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="prepare audio lists")
    p.add_argument("data_dirs", nargs="+")
    p.add_argument("-o", "--output_dir", default="finetune_data/audio_list")
    p.add_argument("--text-suffix", default=".txt")
    p.add_argument("--auto-scan", action="store_true")
    p.add_argument("--split-size", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    speaker_dirs: List[Path] = []
    for d in args.data_dirs:
        d = Path(d)
        if args.auto_scan or not any(d.glob("*.wav")):
            speaker_dirs.extend(scan_speaker_dirs(d))
        else:
            speaker_dirs.append(d)

    total = 0
    for spk_dir in speaker_dirs:
        entries, ok, missing = prepare_single_speaker(spk_dir, args.text_suffix)
        if not entries:
            continue
        if args.split_size > 0 and len(entries) > args.split_size:
            for i in range(0, len(entries), args.split_size):
                part = i // args.split_size + 1
                out = Path(args.output_dir) / f"{spk_dir.name}_part_{part}.list"
                out.write_text("\n".join(entries[i : i + args.split_size]) + "\n",
                               encoding="utf-8")
        else:
            out = Path(args.output_dir) / f"{spk_dir.name}.list"
            out.write_text("\n".join(entries) + "\n", encoding="utf-8")
        print(f"{spk_dir.name}: {ok} clips ({missing} missing transcripts)")
        total += ok
    print(f"total: {total} clips over {len(speaker_dirs)} speakers")


if __name__ == "__main__":
    main()
