#!/bin/bash
# Watch for the TPU relay (127.0.0.1:8082) to come back, then fire the
# serialized measurement campaign (tools/tpu_campaign.sh) detached.
# Run: nohup bash tools/tunnel_watch.sh > /tmp/tunnel_watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
echo "$(date +%H:%M:%S) watching 127.0.0.1:8082 ..."
while ! timeout 2 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  sleep 30
done
echo "$(date +%H:%M:%S) relay UP — waiting 60s for it to settle, then launching campaign"
sleep 60
setsid nohup bash tools/tpu_campaign.sh > /tmp/tpu_campaign.log 2>&1 &
echo $! > /tmp/tpu_campaign.pid
echo "$(date +%H:%M:%S) campaign launched (pid $(cat /tmp/tpu_campaign.pid)), log /tmp/tpu_campaign.log"
