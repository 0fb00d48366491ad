import os, sys, time, random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()
from infimum_tpu.circuits.process import ProcessCircuit

pc = ProcessCircuit(state_tree_depth=10, msg_tree_depth=2, msg_batch_depth=1,
                    vote_option_tree_depth=2)
print(f'build {time.time()-t0:.1f}s', flush=True)
from infimum_tpu.maci.keys import Keypair
from infimum_tpu.maci.replay import MaciReplay
from infimum_tpu.client.user import pack_command
from infimum_tpu.hash.poseidon_host import poseidon
from infimum_tpu.hash.cipher import poseidon_encrypt
from infimum_tpu.witness.process import ProcessWitnessBuilder

coord = Keypair(sk=0xA11CE)
rep = MaciReplay(state_tree_depth=10, msg_tree_depth=2, msg_batch_depth=1,
                 vote_option_tree_depth=2, coordinator=coord,
                 poll_end_timestamp=26)
for sk in (0xB0B, 0xC0C, 0xD0D):
    rep.sign_up(Keypair(sk=sk).pub, timestamp=2)
kp = Keypair(sk=0xB0B)
rng = random.Random(42)
salt = rng.getrandbits(200)
packed = pack_command(1, 5, 1, 1, 0, kp.pub, salt)
r8, s = kp.sign(poseidon(packed))
eph = Keypair(sk=rng.getrandbits(250))
shared = eph.ecdh(coord.pub)
data = poseidon_encrypt(packed + [r8[0], r8[1], s], shared, 0)
rep.publish(data, eph.pub)
pb = ProcessWitnessBuilder(pc, rep)
batches = list(pb.batches(random.Random(7)))
values, meta = batches[0]
t0 = time.time()
w = pc.assignment(values)
print(f'assignment {time.time()-t0:.2f}s, {len(w)} vars', flush=True)
t0 = time.time()
ok = pc.cs.check(w)
print(f'check {time.time()-t0:.2f}s ok={ok}', flush=True)
