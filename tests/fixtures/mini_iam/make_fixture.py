"""Generate the committed mini-IAM fixture (VERDICT r3 #8).

Two forms + XMLs + sets.json in the real IAM on-disk layout
(``/root/reference/utils/parseIAM.py`` consumes the same structure):
each XML line's transcription is rendered with the synthetic renderer
into the line's component-hull region, so the pixels under every IAM
crop contain real ink matching the ground truth — enough signal for the
hwr/auto/gan pipeline smoke to produce finite, falling losses.

Deterministic.  Regenerate from the repo root with:
    python tests/fixtures/mini_iam/make_fixture.py
"""

import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", ".."))

from handwriting_line_generation_tpu.charset import IAM_CHARSET
from handwriting_line_generation_tpu.data.synthetic import render_line

HERE = os.path.dirname(os.path.abspath(__file__))
LINE_H = 44          # rendered line height; crops resize to img_height 64

FORMS = {
    # form id -> (writer id, line texts).  Two writers x four short lines:
    # enough for 2 author groups per writer at a_batch_size 2, short enough
    # that every crop fits the 320 width bucket after the 64-height resize.
    "f01-000": ("001", ["the fox", "a lazy dog", "we ran far", "old pine"]),
    "f02-000": ("002", ["rain came", "send it now", "good day", "hot tea"]),
}


def word_cmp_boxes(text, x0, y0, width):
    """Per-word <cmp> boxes splitting [x0, x0+width) by char count."""
    words = text.split(" ")
    total = sum(len(w) for w in words) + len(words) - 1
    boxes, x = [], x0
    for i, w in enumerate(words):
        frac = len(w) / total
        wpx = max(4, int(round(width * frac)))
        if i == len(words) - 1:                 # hull must end exactly
            wpx = x0 + width - x
        boxes.append((w, x, y0, wpx, LINE_H))
        x += wpx + max(1, int(round(width / total)))  # skip the space span
    return boxes


def main():
    os.makedirs(os.path.join(HERE, "xmls"), exist_ok=True)
    os.makedirs(os.path.join(HERE, "forms"), exist_ok=True)
    for fi, (form, (writer, texts)) in enumerate(sorted(FORMS.items())):
        page = np.full((420, 360), 255, np.uint8)
        xml_lines = [f'<form id="{form}" writer-id="{writer}">',
                     "  <handwritten-part>"]
        for li, text in enumerate(texts):
            img = render_line(text, IAM_CHARSET, author_id=fi * 7 + li % 2,
                              img_height=LINE_H, seed=fi * 100 + li)
            y0 = 30 + li * 95
            x0 = 24
            w = min(img.shape[1], page.shape[1] - x0 - 8)
            page[y0:y0 + LINE_H, x0:x0 + w] = img[:, :w]
            xml_lines.append(f'    <line text="{text}">')
            for word, wx, wy, ww, wh in word_cmp_boxes(text, x0, y0, w):
                xml_lines.append(
                    f'      <word text="{word}"><cmp x="{wx}" y="{wy}" '
                    f'width="{ww}" height="{wh}"/></word>')
            xml_lines.append("    </line>")
        xml_lines += ["  </handwritten-part>", "</form>", ""]
        with open(os.path.join(HERE, "xmls", form + ".xml"), "w") as f:
            f.write("\n".join(xml_lines))
        cv2.imwrite(os.path.join(HERE, "forms", form + ".png"), page)
        print("wrote", form)
    with open(os.path.join(HERE, "sets.json"), "w") as f:
        json.dump({"train": sorted(FORMS), "valid": [sorted(FORMS)[1]],
                   "test": [sorted(FORMS)[0]]}, f, indent=1)
    print("sets.json written")


if __name__ == "__main__":
    main()
