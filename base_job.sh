#!/bin/bash
#SBATCH -N 1
#SBATCH -t 02:00:00
#SBATCH -J tsadar-tpu
# base SLURM template; queue_tsadar_tpu.py appends the srun line
export BASE_TEMPDIR=$SCRATCH
