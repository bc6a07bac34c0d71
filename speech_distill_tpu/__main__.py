"""Unified CLI: ``python -m speech_distill_tpu <command> [flags]``.

Commands map 1:1 to the reference's top-level scripts.
"""
import sys

COMMANDS = {
    "prepare-student": ("speech_distill_tpu.pipelines.prepare_student",
                        "expand student vocab to the teacher's"),
    "stage1": ("speech_distill_tpu.pipelines.stage1",
               "stage-1 warm-up (new speech-token embeddings)"),
    "prepare-dataset": ("speech_distill_tpu.pipelines.prepare_dataset",
                        "offline audio -> aligned input-id preprocessing"),
    "extract-logits": ("speech_distill_tpu.pipelines.extract_logits",
                       "teacher top-K logprob extraction"),
    "train": ("speech_distill_tpu.pipelines.train",
              "stage-2 knowledge distillation"),
    "synthesize": ("speech_distill_tpu.pipelines.synthesize",
                   "TTS synthesis from a podcast script"),
    "evaluate": ("speech_distill_tpu.pipelines.evaluate",
                 "distilled-model quality eval (agreement/KL + audio smoke)"),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m speech_distill_tpu <command> [flags]\n")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:18s} {desc}")
        sys.exit(0 if len(sys.argv) >= 2 else 1)
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}; one of {', '.join(COMMANDS)}")
        sys.exit(1)
    import os
    if os.environ.get("SDT_FORCE_CPU"):
        # must run before backend init; the axon sitecustomize overrides
        # the JAX_PLATFORMS env var, so set jax.config directly
        import jax
        jax.config.update("jax_platforms", "cpu")
    module, _ = COMMANDS[cmd]
    import importlib
    importlib.import_module(module).main(sys.argv[2:])


if __name__ == "__main__":
    main()
