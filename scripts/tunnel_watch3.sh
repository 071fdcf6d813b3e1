#!/bin/bash
# Probe the axon tunnel every 10 min; log health; fire queue8 once on first health.
LOG=/root/repo/TUNNEL_r03s12.log
FIRED=/root/repo/.queue8_fired
while true; do
  OUT=$(timeout 240 python -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
print(np.asarray(jnp.sum(jnp.ones((128,128)))))
print(d)
" 2>&1 | tail -2)
  if echo "$OUT" | grep -q "16384"; then
    echo "$(date +%H:%M:%S) HEALTHY" >> $LOG
    if [ ! -f $FIRED ] && [ -x /root/repo/scripts/tpu_queue8.sh ]; then
      touch $FIRED
      echo "$(date +%H:%M:%S) firing tpu_queue8" >> $LOG
      bash /root/repo/scripts/tpu_queue8.sh >> $LOG 2>&1
      echo "$(date +%H:%M:%S) queue8 finished" >> $LOG
    fi
  else
    echo "$(date +%H:%M:%S) down: $(echo $OUT | head -c 100)" >> $LOG
  fi
  sleep 600
done
