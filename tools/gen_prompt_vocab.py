#!/usr/bin/env python
"""Generate the packaged prompt-lexicon WordPiece vocab for GroundingDINO.

The real pipeline tokenizes with bert-base-uncased's vocab.txt (reference
GroundingDINO util/get_tokenlizer.py); that file is not redistributable from
this environment (zero egress, no cached copy). Detection over the SLAM
system's OWN prompt surface doesn't need the full 30,522-entry vocab though:
every caption the system ever emits comes from ScenePromptManager.SCENES,
COCO_DYNAMIC_CLASSES, and user scene overrides — a closed lexicon. This
script derives a compact vocab that tokenizes that lexicon word-level and
ANY other ASCII word char-level (no [UNK] for normal text), and writes it to
lvdgs_tpu/models/groundingdino/assets/prompt_vocab.txt.

IMPORTANT: ids do NOT match bert-base-uncased, so detections with CONVERTED
PRETRAINED weights require the matching real vocab.txt (pass vocab_path, or
drop vocab.txt next to the checkpoint). The packaged vocab exists so the
text pipeline is exact and deterministic for architecture runs, unit tests,
and fresh-trained weights.

Run: python tools/gen_prompt_vocab.py  (idempotent, checked-in output)
"""
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvdgs_tpu.perception.masking import ScenePromptManager
from lvdgs_tpu.perception.dynamic_filter import COCO_DYNAMIC_CLASSES

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lvdgs_tpu", "models", "groundingdino", "assets", "prompt_vocab.txt",
)

# extra words that appear in reference prompts/tools beyond the scene table
EXTRA_WORDS = [
    "ground", "sky", "sidewalk", "vehicle", "moving", "parked", "object",
    "dynamic", "static", "wheel", "window", "rider", "child", "adult",
    "traffic", "light", "crowd", "shadow",
]


def main():
    words = set()
    for scene in ScenePromptManager.SCENES.values():
        for phrase_list in scene.values():
            for phrase in phrase_list:
                words.update(phrase.lower().split())
    words.update(w.lower() for w in COCO_DYNAMIC_CLASSES)
    words.update(EXTRA_WORDS)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "."]
    # char-level base + continuations: any ASCII word tokenizes without [UNK]
    chars = list(string.ascii_lowercase) + list(string.digits) + ["-", "'"]
    vocab += chars
    vocab += ["##" + c for c in chars]
    # common English suffix pieces for better-than-char continuation
    vocab += ["##s", "##ing", "##ed", "##er", "##es"]
    vocab += sorted(words)

    seen = set()
    uniq = []
    for t in vocab:
        if t not in seen:
            seen.add(t)
            uniq.append(t)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(uniq) + "\n")
    print(f"wrote {len(uniq)} tokens -> {OUT}")


if __name__ == "__main__":
    main()
