"""Analytical FLOPs / bytes roofline for the flagship cost centers
(VERDICT r3 weak #5: convert "gather-bound" from folklore into budget).

Prints, per cost center, the FLOPs, the HBM bytes moved, the
compute-bound and bandwidth-bound time floors on a v5e, and — when a
measured number is supplied — the achieved fraction of whichever bound
binds.  Measured numbers come from the on-device parts benches
(tools/bench_parts.py / bench_rb_parts.py / bench_vovnet_convs.py);
re-run those and update MEASURED_MS when the profile shifts.

v5e peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.  f32
matmuls on the MXU execute as bf16-product passes (PERF.md) — we charge
f32 convs ONE pass (XLA default precision) at the bf16 rate, with f32
operand bytes.

    python tools/roofline.py          # pure analysis, no device needed
"""
import sys

PEAK_BF16 = 197e12
PEAK_HBM = 819e9

# measured stream ms on one v5e (2026-08-21 round-5 refresh, fp32
# defaults; head bwd = scan_u5 grad minus fwd, bench_head_parts)
MEASURED_MS = {
    "voxelize (262k pts sort+scatter)": 11.8,
    "encoder stage0 subm rulebook": 7.5,
    "encoder stage0 downsample": 8.0,
    "encoder convs (all stages, one-hot)": 35.0,
    "SECOND": 5.2,
    "FPN": 4.7,
    "decoder head (5 iters)": 19.7,
    "decode+NMS": 4.5,
    "VoVNet-99 bf16 (LC)": 139.5,
    "head bwd (train)": 49.0,
}


# measured XLA row-gather/scatter wall on this chip: ~9-12 ns per
# gathered row regardless of row bytes (PERF.md round-1: 3.24M int32
# rows = 38 ms -> 11.7 ns; bench_rb_parts pk/pkv rows agree).  This is
# the EMPIRICAL price of XLA's gather lowering, not a hardware limit —
# the Pallas kernels exist precisely to delete it.
NS_PER_ROW = 10.0


def row(name, flops, bytes_, measured=None, note="", gather_rows=0):
    t_c = flops / PEAK_BF16 * 1e3
    t_b = bytes_ / PEAK_HBM * 1e3
    t_r = gather_rows * NS_PER_ROW * 1e-6
    floor = max(t_c, t_b)
    bound = "MXU" if t_c >= t_b else "HBM"
    if t_r > floor:
        bound = "ROW"
    pred = max(floor, t_r)
    eff = f"{pred / measured * 100:5.1f}%" if measured else "    —"
    meas = f"{measured:7.1f}" if measured else "      —"
    print(f"{name:42s} {flops/1e9:9.1f} {bytes_/1e6:9.1f} "
          f"{t_c:7.2f} {t_b:7.2f} {t_r:7.2f} {bound:4s} {meas} {eff}"
          f"  {note}")


def main():
    B, V, PTS = 1, 120_000, 262_144
    print(f"{'cost center':42s} {'GFLOP':>9s} {'MB':>9s} "
          f"{'t_mxu':>7s} {'t_hbm':>7s} {'t_row':>7s} bnd  "
          f"{'meas':>7s} {'eff':>6s}")

    # ---- voxelizer: one 262k (key,idx) sort (~log2 passes over 2 MB)
    # + coords gather + ~6 scatters/prefix passes
    sort_passes = 18 * 2           # bitonic-ish: log^2/2 rounds, rw
    vox_bytes = PTS * 8 * sort_passes + PTS * (12 + 4 * 6)
    row("voxelize (sort-bound)", 0.01e9, vox_bytes,
        MEASURED_MS["voxelize (262k pts sort+scatter)"],
        "sort passes dominate; not a roofline op")

    # ---- stage-0 subm rulebook
    # gather path: nbr 3x(P,3)x12B slice rows + pk (P*9)x12B + pkv
    # (V*9)x36B + idx write (V*27*4).  Row-gather effective BW is the
    # real wall (~30 GB/s, PERF.md) — the table shows the IDEAL bytes.
    rb_bytes = V * 3 * 12 + V * 9 * 12 + V * 9 * 36 + V * 27 * 4
    row("stage0 subm rulebook (gather path)", 0.0, rb_bytes,
        MEASURED_MS["encoder stage0 subm rulebook"],
        "nbr 3x3-slices + pk 9P + pkv 9V rows",
        gather_rows=V * 3 + V * 9 + V * 9)
    # eqmatch kernel: windows (T*3*(wc*128B + wc*256B)) + eq matmuls
    T = -(-V // 256)
    wc = 1024
    eq_flops = T * 9 * (256 * wc * 128 * 2)
    eq_bytes = T * 3 * wc * (128 + 256) + V * 27 * 4
    row("stage0 subm rulebook (eqmatch kernel)", eq_flops, eq_bytes,
        None, "windows re-DMA per tile")

    # ---- encoder convs (one-hot kernel), all stages
    # basicblock nusc: stage v-caps 120k/60k/30k/15k, convs per stage
    # (2 per basic block x blocks) + downsamples + conv_out
    stages = [(120_000, [(5, 16)] + [(16, 16)] * 4 + [(16, 32)]),
              (60_000, [(32, 32)] * 4 + [(32, 64)]),
              (30_000, [(64, 64)] * 4 + [(64, 128)]),
              (15_000, [(128, 128)] * 4)]
    conv_flops = conv_bytes = 0
    for v, convs in stages:
        for cin, cout in convs:
            conv_flops += 2 * v * 27 * cin * cout
            # one-hot kernel: window DMA ~ 3 groups x (v/tm tiles) x
            # wp*128B rows + weights + out write
            conv_bytes += v * 27 * 4 + v * cout * 4 + \
                (v // 512 + 1) * 3 * 1024 * 128
    conv_flops += 2 * 15_000 * 3 * 128 * 128          # conv_out
    row("encoder gathered convs (fp32)", conv_flops, conv_bytes,
        MEASURED_MS["encoder convs (all stages, one-hot)"],
        "one-hot adds (3tm,wp)x(wp,128) matmuls")

    # ---- SECOND (dense BEV convs, 184^2)
    g = 184
    sec_flops = 0
    ch = 256  # input 128*2 z-collapsed? actual: D*C = 2*128 = 256
    for cout, n, s in ((128, 5, 1), (256, 5, 2)):
        gg = g // s
        sec_flops += 2 * gg * gg * 9 * ch * cout
        sec_flops += n * 2 * gg * gg * 9 * cout * cout
        ch = cout
    sec_bytes = g * g * 256 * 4 * 2 + (g // 2) ** 2 * 256 * 4 * 2
    row("SECOND (fp32)", sec_flops, sec_bytes, MEASURED_MS["SECOND"])

    # ---- FPN: 1x1 laterals + 3x3 smoothing at 184, 92 (+2 extra pools)
    fpn_flops = 2 * (184 ** 2 * 128 * 128 + 92 ** 2 * 256 * 128) + \
        2 * 9 * 128 * 128 * (184 ** 2 + 92 ** 2)
    row("FPN (fp32)", fpn_flops, 40e6, MEASURED_MS["FPN"])

    # ---- decoder head: 5 iters x (RoI 900x32x32 patch gather + attn
    # 900^2x128 + DynamicConv 900x(49x128x32 x2) + FFN 900x128x512 + towers)
    NP, C, FF, DD, S = 900, 128, 512, 32, 7 * 7
    it_flops = (2 * NP * NP * C * 2 +                  # self-attn qk+av
                2 * NP * C * 3 * C +                   # qkv proj
                2 * NP * (S * C * DD + S * DD * C) +   # dynamic conv
                2 * NP * S * C * C // 4 +              # roi reduce-ish
                2 * NP * C * FF * 2 +                  # FFN
                2 * NP * C * C * 6)                    # towers/proj
    head_flops = 5 * it_flops
    head_bytes = 5 * (NP * 32 * 32 * C * 4 // 4)       # patch gathers
    # patch RoIAlign: 900 RoIs x 4 levels? one level each x 32 slice rows
    roi_rows = 5 * NP * 32
    row("decoder head 5 iters (fp32)", head_flops, head_bytes,
        MEASURED_MS["decoder head (5 iters)"],
        "attn+dynconv small; RoI slices", gather_rows=roi_rows)
    row("head bwd (train, ~2x fwd +dW)", 3 * head_flops, 2 * head_bytes,
        MEASURED_MS["head bwd (train)"],
        "NOT FLOP bound: scatter-add transposes",
        gather_rows=2 * roi_rows)

    # ---- VoVNet-99 @ 6x928x1600 bf16 (stage FLOPs from the block math)
    def osa(px, cin, ch, cout, n_layers, blocks):
        f = 0
        c = cin
        for b in range(blocks):
            f += px * (9 * c * ch + (n_layers - 1) * 9 * ch * ch +
                       (c + n_layers * ch) * cout)
            c = cout
        return 2 * f
    px = lambda s: 6 * (928 // s) * (1600 // s)
    vov_flops = (2 * (px(2) * 9 * 3 * 64 + px(2) * 9 * 64 * 64 +
                      px(4) * 9 * 64 * 128) +
                 osa(px(4), 128, 128, 256, 5, 1) +
                 osa(px(8), 256, 160, 512, 5, 3) +
                 osa(px(16), 512, 192, 768, 5, 9) +
                 osa(px(32), 768, 224, 1024, 5, 3))
    vov_bytes = sum(px(s) for s in (4, 8, 16, 32)) * 1500 * 2 * 3
    row("VoVNet-99 bf16 (LC 6x928x1600)", vov_flops, vov_bytes,
        MEASURED_MS["VoVNet-99 bf16 (LC)"],
        "128-lane pad waste: 160/192 ch -> ~62/75%")

    print("""
Reading:
  eff = floor(max(t_mxu, t_hbm)) / measured — how close the measured
  time sits to its BINDING v5e roofline.  Low eff on gather-shaped ops
  reflects the XLA row-gather wall (~9-12 ns/row regardless of bytes),
  which the Pallas kernels (one-hot, eqmatch) attack by converting
  gathers into windowed DMA + MXU matmuls — their budget rows charge
  those matmul FLOPs explicitly.""")


if __name__ == "__main__":
    main()
