#!/bin/bash
cd /root/repo
sbt -batch test > target/scale_logs/r16_test_final.log 2>&1
echo "r16_test_final exit=$?" >> target/scale_logs/status16.txt
