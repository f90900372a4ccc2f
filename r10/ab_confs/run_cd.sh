#!/bin/bash
cd /root/repo
QS="lsh_recall_eval,semantic_cluster_dups,embedding_cosine_dups,embedding_cosine_dups_expanded,shingle_similarity_join,neardup_clusters,band_skew_profile,shingle_containment_pairs,simhash_hamming_pairs,span_dedup_spans,contrastive_negatives,span_dedup_clean,minhash_lsh_pairs,part_cooccurrence,heaps_law_fit"
for i in 1 2; do
  for arm in A B C D; do
    case $arm in
      A) export SPARK_GRAFT_AQE_MIN_PARTITION=16k SPARK_GRAFT_OPEN_COST=64k;;
      B) export SPARK_GRAFT_AQE_MIN_PARTITION=1m  SPARK_GRAFT_OPEN_COST=4m;;
      C) export SPARK_GRAFT_AQE_MIN_PARTITION=16k SPARK_GRAFT_OPEN_COST=4m;;
      D) export SPARK_GRAFT_AQE_MIN_PARTITION=1m  SPARK_GRAFT_OPEN_COST=64k;;
    esac
    python bench.py --queries "$QS" 2> r10/ab_confs/sub_stderr_${arm}${i}.txt > r10/ab_confs/sub_stdout_${arm}${i}.txt
    echo "sub $i $arm rc=$?" >> r10/ab_confs/log.txt
  done
done
echo SUBDONE >> r10/ab_confs/log.txt
