"""A/B probe: T5 query-init scale vs t5_base trainability.

Round-3 finding: t5_base (d=768, 12+12 layers) stalled/destabilized at the
lr that trained every shallow preset (EVIDENCE.md "t5_base training honesty
note"). Candidate root cause: MultiHeadAttention omitted T5's query-init
compensation for the missing 1/sqrt(d_kv) attention scale, so init logits
had std ~ sqrt(64)=8 — a near-saturated softmax whose damage compounds
with depth.

This probe trains t5_base for a short, identical-recipe leg twice:
  arm "fixed"  — HEAD (q std = (d_model*d_kv)^-0.5)
  arm "legacy" — the round-3 un-compensated init, reproduced by patching
                 MultiHeadAttention.setup (the only difference).
and logs loss/shift-acc trajectories to artifacts/qinit_ab/<arm>.jsonl.

Usage: python scripts/probe_qinit_ab.py <arm> [steps] [lr]
"""
import sys

sys.path.insert(0, "/root/repo")

arm = sys.argv[1]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 800
lr = sys.argv[3] if len(sys.argv) > 3 else "3e-4"
assert arm in ("fixed", "legacy")

if arm == "legacy":
    from flax import linen as nn

    from yourmt3_tpu.models import layers

    def legacy_setup(self):
        d_inner = self.num_heads * self.d_kv
        kinit = nn.initializers.variance_scaling(1.0, "fan_in", "normal")
        self.q = layers.QuantDense(d_inner, dtype=self.dtype,
                                   kernel_init=kinit, name="q")
        self.k = layers.QuantDense(d_inner, dtype=self.dtype,
                                   kernel_init=kinit, name="k")
        self.v = layers.QuantDense(d_inner, dtype=self.dtype,
                                   kernel_init=kinit, name="v")
        self.o = layers.QuantDense(self.d_model, dtype=self.dtype,
                                   kernel_init=kinit, name="o")

    layers.MultiHeadAttention.setup = legacy_setup

from yourmt3_tpu.cli.train import main  # noqa: E402

main([
    f"qinit_{arm}", "-d", "synth_big", "-m", "t5_base", "-b", "16",
    "-s", str(steps), "-lr", lr, "--warmup-steps", "200",
    "--ckpt-every", str(steps), "--log-every", "25", "--seed", "0",
    "--ckpt-dir", f"runs/qinit_{arm}",
])
