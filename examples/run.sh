#!/bin/bash
# Example scenarios, mirroring the reference's examples/run.sh.
# Uses the reference's example data (adjust DATA for your checkout).
DATA=${DATA:-/root/reference/examples/data}
outname=aligned.fasta
scenario=${1:-4}

case $scenario in
1)  # Scenario A - unaligned sequences only
    python -m witch_tpu -i ${DATA}/unaligned_all.fasta -d scenarioA_output \
        -o ${outname} ;;
2)  # Scenario B - unaligned input; raw bitscores; 10 HMMs per query
    python -m witch_tpu -i ${DATA}/unaligned_all.fasta -d scenarioB_output \
        -o ${outname} -w 0 -k 10 ;;
3)  # Scenario C - backbone alignment, no tree
    python -m witch_tpu -b ${DATA}/backbone.aln.fasta.gz \
        -q ${DATA}/unaligned_frag.fasta -d scenarioC_output -o ${outname} \
        --save-weight 1 ;;
4)  # Scenario D - backbone alignment + tree
    python -m witch_tpu -b ${DATA}/backbone.aln.fasta.gz \
        -e ${DATA}/backbone.tre \
        -q ${DATA}/unaligned_frag.fasta -d scenarioD_output -o ${outname} \
        --save-weight 1 --keep-decomposition 1 ;;
5)  # Scenario E - as D, with a user config file
    python -m witch_tpu -b ${DATA}/backbone.aln.fasta.gz \
        -e ${DATA}/backbone.tre \
        -q ${DATA}/unaligned_frag.fasta -d scenarioE_output -o ${outname} \
        --save-weight 1 --keep-decomposition 1 -c user.config ;;
esac
