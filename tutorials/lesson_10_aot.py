"""Lesson 10/15: AOT compilation via generators (reference: lesson_10,
lesson_15_generators)."""
import json
import os
import tempfile


def main():
    from halide_tpu.tools import gen as gen_cli
    out = tempfile.mkdtemp()
    rc = gen_cli.main(["-g", "blur", "-o", out, "-e",
                       "hlpipe,stmt,metadata", "width=64", "height=48"])
    assert rc == 0
    meta = json.load(open(os.path.join(out, "blur.metadata.json")))
    print("lesson 10: emitted", sorted(os.listdir(out)), "inputs:",
          [i["name"] for i in meta["inputs"]])


if __name__ == "__main__":
    main()
