#!/bin/bash
# Serial A/B measurement of the outage-window kernels on the live TPU.
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name : $* ===" >> /root/repo/.bench_logs/ab_results.txt
  env "$@" DINOUNET_TPU_BENCH_BATCH=8 timeout 600 python bench.py \
    >> /root/repo/.bench_logs/ab_results.txt 2> /root/repo/.bench_logs/$name.err
  echo "rc=$?" >> /root/repo/.bench_logs/ab_results.txt
}
run plain    DINOUNET_TPU_DECODER_TAIL=jax  DINOUNET_TPU_SPM_CM=jax  DINOUNET_TPU_MSDA_PREP=xla
run tail     DINOUNET_TPU_DECODER_TAIL=auto DINOUNET_TPU_SPM_CM=jax  DINOUNET_TPU_MSDA_PREP=xla
run spm      DINOUNET_TPU_DECODER_TAIL=jax  DINOUNET_TPU_SPM_CM=auto DINOUNET_TPU_MSDA_PREP=xla
run both     DINOUNET_TPU_DECODER_TAIL=auto DINOUNET_TPU_SPM_CM=auto DINOUNET_TPU_MSDA_PREP=xla
run prep     DINOUNET_TPU_DECODER_TAIL=jax  DINOUNET_TPU_SPM_CM=jax  DINOUNET_TPU_MSDA_PREP=fused
echo "ALL DONE" >> /root/repo/.bench_logs/ab_results.txt
