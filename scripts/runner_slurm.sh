#!/bin/bash
#SBATCH --job-name=art_tpu
#SBATCH --ntasks=10
#SBATCH --mem-per-cpu=8G
#SBATCH --time=100:00:00
# Cluster runner (reference: src/runner_GR_tasks.sh) — ten SLURM shard tasks
# plus a final combine task.  On TPU pods use one task per host with
# jax.distributed instead; this preserves the file-shard path.
declare -i trajs=900
for i in $(seq 0 9); do
  srun --ntasks=1 --exclusive \
    python -m adiabatic_raytracer_tpu --MassA 1e-5 --B0 1e14 --ThetaM 0.2 \
      --Nts $trajs --ftag "gr_$i" &> "gr_$i.log" &
done
wait
srun --ntasks=1 --exclusive \
  python -m adiabatic_raytracer_tpu --run_RT 0 --run_Combine 1 --side_runs 10 \
    --MassA 1e-5 --B0 1e14 --ThetaM 0.2 --Nts $trajs --ftag "gr_"
