"""HTTP server: native + OpenAI endpoints on aiohttp
(analog of sglang srt/entrypoints/http_server.py — FastAPI is not in this
image, aiohttp.web provides the same surface).

Process topology (mirrors engine.py:88-99 of the reference):
  main process:   aiohttp app + TokenizerManager
  subprocess:     Scheduler (owns the TPU slice)     [ZMQ scheduler_ipc]
  subprocess:     Detokenizer                        [ZMQ detokenizer_ipc]
Data ring: tokenizer -> scheduler -> detokenizer -> tokenizer.
"""

from __future__ import annotations

import asyncio
import json
import multiprocessing as mp
import uuid
from typing import Optional

from aiohttp import web

from iaas_sglang_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    ChatCompletionResponse,
    ChatCompletionResponseChoice,
    ChatCompletionStreamChoice,
    ChatCompletionStreamResponse,
    ChatMessage,
    CompletionRequest,
    CompletionResponse,
    CompletionResponseChoice,
    DeltaMessage,
    ModelCard,
    ModelList,
    UsageInfo,
    map_finish_reason,
)
from iaas_sglang_tpu.managers.detokenizer_manager import run_detokenizer_process
from iaas_sglang_tpu.managers.io_struct import GenerateReqInput
from iaas_sglang_tpu.managers.scheduler import run_scheduler_process
from iaas_sglang_tpu.managers.tokenizer_manager import TokenizerManager
from iaas_sglang_tpu.server_args import PortArgs, ServerArgs
from iaas_sglang_tpu.utils import configure_logger, kill_process_tree, logger


class ServerState:
    def __init__(self, server_args: ServerArgs, port_args: PortArgs,
                 tokenizer_manager: TokenizerManager, procs):
        self.server_args = server_args
        self.port_args = port_args
        self.tokenizer_manager = tokenizer_manager
        self.procs = procs


def _launch_subprocesses(server_args: ServerArgs, port_args: PortArgs):
    """Spawn scheduler + detokenizer subprocesses; wait for scheduler ready
    (analog of entrypoints/engine.py:681 _launch_subprocesses)."""
    ctx = mp.get_context("spawn")
    reader, writer = ctx.Pipe(duplex=False)
    if server_args.dp_size > 1:
        from iaas_sglang_tpu.managers.data_parallel_controller import (
            run_data_parallel_controller_process,
        )

        # not daemonic: the controller spawns the replica schedulers
        sched = ctx.Process(
            target=run_data_parallel_controller_process,
            args=(server_args, port_args, writer),
        )
    else:
        sched = ctx.Process(
            target=run_scheduler_process,
            args=(server_args, port_args, writer),
            daemon=True,
        )
    sched.start()
    detok = ctx.Process(
        target=run_detokenizer_process,
        args=(server_args, port_args),
        daemon=True,
    )
    detok.start()
    msg = reader.recv()
    if msg.get("status") != "ready":
        raise RuntimeError(f"scheduler failed to start: {msg}")
    logger.info("scheduler ready: %s", msg)
    return [sched, detok]


# ------------------------------------------------------------------ handlers


async def handle_health(request: web.Request) -> web.Response:
    return web.Response(text="ok")


async def handle_health_generate(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    gri = GenerateReqInput(
        rid=uuid.uuid4().hex,
        input_ids=[0],
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
    )
    async for _ in state.tokenizer_manager.generate_request(gri):
        pass
    return web.Response(text="ok")


async def handle_get_server_info(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    internal = await state.tokenizer_manager.get_internal_state()
    import dataclasses

    return web.json_response({
        **dataclasses.asdict(state.server_args),
        "internal_states": [internal],
        "version": __import__("iaas_sglang_tpu").__version__,
    })


async def handle_get_model_info(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    return web.json_response({
        "model_path": state.server_args.model_path,
        "tokenizer_path": state.server_args.tokenizer_path,
        "is_generation": True,
    })


async def handle_sagemaker_invocations(request: web.Request
                                       ) -> web.StreamResponse:
    """SageMaker surface: /ping (GET, health) + /invocations (POST, chat
    completions) — reference http_server.py:810-826."""
    return await handle_chat_completions(request)


async def handle_vertex_generate(request: web.Request) -> web.Response:
    """Vertex AI prediction surface (reference http_server.py:827):
    {"instances": [{text|input_ids, image_data?}], "parameters": {...}}
    -> {"predictions": [...]}"""
    state: ServerState = request.app["state"]
    body = await request.json()
    instances = body.get("instances") or []
    if not instances:
        return web.json_response([])
    inputs = {}
    for key in ("text", "input_ids"):
        if instances[0].get(key) is not None:
            inputs[key] = [inst.get(key) for inst in instances]
            break
    image_data = [inst.get("image_data") for inst in instances
                  if inst.get("image_data") is not None] or None
    gri = GenerateReqInput(image_data=image_data,
                           **(body.get("parameters") or {}), **inputs)
    tm = state.tokenizer_manager
    outs = await asyncio.gather(*[
        _collect_last(tm, g) for g in gri.normalize()
    ])
    return web.json_response({"predictions": outs})


async def handle_eplb_rebalance(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import (EplbRebalanceReqInput,
                                                    EplbRebalanceReqOutput)

    body = {}
    try:
        body = await request.json()
    except Exception:
        pass
    out = await state.tokenizer_manager._rpc(
        EplbRebalanceReqInput(int(body.get("num_redundant_experts", 0))),
        EplbRebalanceReqOutput)
    return web.json_response({"success": out.success,
                              "message": out.message,
                              "balancedness": out.balancedness})


async def handle_weight_rpc(request: web.Request) -> web.Response:
    """Weight-lifecycle RPCs (reference http_server.py:562-630):
    update_weights_from_disk / init_weights_update_group /
    update_weights_from_distributed / save_sharded_model /
    save_remote_model / release+resume_memory_occupation."""
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers import io_struct as S

    action = request.match_info["action"]
    body = {}
    try:
        body = await request.json()
    except Exception:
        pass
    table = {
        "update_weights_from_disk": (
            S.UpdateWeightFromDiskReqInput(
                body.get("model_path", ""),
                body.get("load_format", "auto")),
            S.UpdateWeightFromDiskReqOutput),
        "init_weights_update_group": (
            S.InitWeightsUpdateGroupReqInput(
                body.get("master_address", "127.0.0.1"),
                int(body.get("master_port", 0)),
                body.get("group_name", "weight_update_group")),
            S.InitWeightsUpdateGroupReqOutput),
        "update_weights_from_distributed": (
            S.UpdateWeightsFromDistributedReqInput(
                body.get("names", []), body.get("dtypes"),
                body.get("shapes")),
            S.UpdateWeightsFromDistributedReqOutput),
        "save_sharded_model": (
            S.SaveShardedModelReqInput(
                body.get("path", ""),
                int(body.get("max_shard_bytes", 2 << 30))),
            S.SaveShardedModelReqOutput),
        "save_remote_model": (
            S.SaveRemoteModelReqInput(body.get("url", "")),
            S.SaveRemoteModelReqOutput),
        "release_memory_occupation": (
            S.ReleaseMemoryOccupationReqInput(),
            S.ReleaseMemoryOccupationReqOutput),
        "resume_memory_occupation": (
            S.ResumeMemoryOccupationReqInput(),
            S.ResumeMemoryOccupationReqOutput),
    }
    req, resp_type = table[action]
    out = await state.tokenizer_manager._rpc(req, resp_type)
    return web.json_response({
        "success": getattr(out, "success", True),
        "message": getattr(out, "message", ""),
    })


async def handle_flush_cache(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    out = await state.tokenizer_manager.flush_cache()
    return web.json_response(
        {"success": out.success, "num_pages_freed": out.num_pages_freed},
        status=200 if out.success else 503,
    )


@web.middleware
async def error_middleware(request: web.Request, handler):
    try:
        return await handler(request)
    except json.JSONDecodeError:
        return web.json_response(
            {"error": {"message": "invalid JSON body"}}, status=400)
    except (KeyError, TypeError, ValueError, AssertionError) as e:
        return web.json_response(
            {"error": {"message": f"{type(e).__name__}: {e}"}}, status=400)


async def handle_generate(request: web.Request) -> web.StreamResponse:
    state: ServerState = request.app["state"]
    body = await request.json()
    stream = body.get("stream", False)
    gri = GenerateReqInput(
        rid=body.get("rid"),
        text=body.get("text"),
        input_ids=body.get("input_ids"),
        sampling_params=body.get("sampling_params"),
        stream=stream,
        return_logprob=body.get("return_logprob", False),
        logprob_start_len=body.get("logprob_start_len", -1),
        top_logprobs_num=body.get("top_logprobs_num", 0),
        token_ids_logprob=body.get("token_ids_logprob"),
        session_id=body.get("session_id"),
        disagg_decode_url=body.get("disagg_decode_url"),
        lora_path=body.get("lora_path"),
        image_data=body.get("image_data"),
        audio_data=body.get("audio_data"),
    )
    tm = state.tokenizer_manager

    if gri.is_batch():
        singles = gri.normalize()
        outs = await asyncio.gather(*[
            _collect_last(tm, g) for g in singles
        ])
        return web.json_response(outs)
    (gri,) = gri.normalize()
    gri.stream = stream

    if not stream:
        return web.json_response(await _collect_last(tm, gri))

    resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
    await resp.prepare(request)
    async for chunk in tm.generate_request(gri):
        await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
    await resp.write(b"data: [DONE]\n\n")
    await resp.write_eof()
    return resp


async def _collect_last(tm: TokenizerManager, gri: GenerateReqInput) -> dict:
    last = None
    async for chunk in tm.generate_request(gri):
        last = chunk
    return last


async def handle_abort_request(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    body = await request.json()
    await state.tokenizer_manager.abort_request(body["rid"])
    return web.Response(text="ok")


# ---------------------------------------------------------------- OpenAI API


async def handle_load_lora(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import (
        LoadLoRAAdapterReqInput,
        LoadLoRAAdapterReqOutput,
    )

    body = await request.json()
    out = await state.tokenizer_manager._rpc(
        LoadLoRAAdapterReqInput(body["lora_name"], body["lora_path"]),
        LoadLoRAAdapterReqOutput)
    return web.json_response(
        {"success": out.success, "message": out.message},
        status=200 if out.success else 400)


async def handle_unload_lora(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import (
        LoadLoRAAdapterReqOutput,
        UnloadLoRAAdapterReqInput,
    )

    body = await request.json()
    out = await state.tokenizer_manager._rpc(
        UnloadLoRAAdapterReqInput(body["lora_name"]),
        LoadLoRAAdapterReqOutput)
    return web.json_response({"success": out.success})


async def handle_start_profile(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import ProfileReq, ProfileReqOutput

    body = {}
    try:
        body = await request.json()
    except Exception:
        pass
    out = await state.tokenizer_manager._rpc(
        ProfileReq("start", body.get("output_dir",
                                     "/tmp/iaas_sglang_tpu_trace")),
        ProfileReqOutput)
    return web.json_response({"success": out.success, "message": out.message})


async def handle_stop_profile(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import ProfileReq, ProfileReqOutput

    out = await state.tokenizer_manager._rpc(
        ProfileReq("stop"), ProfileReqOutput)
    return web.json_response({"success": out.success, "message": out.message})


async def handle_expert_distribution(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    from iaas_sglang_tpu.managers.io_struct import (
        ExpertDistributionReq,
        ExpertDistributionReqOutput,
    )

    action = request.match_info["action"].split("_")[0]  # start|stop|dump
    out = await state.tokenizer_manager._rpc(
        ExpertDistributionReq(action), ExpertDistributionReqOutput)
    counts = out.counts.tolist() if out.counts is not None else None
    return web.json_response({"success": out.success, "counts": counts})


async def handle_disagg_wait(request: web.Request) -> web.Response:
    """PD decode side: block until a handed-off request finishes here."""
    state: ServerState = request.app["state"]
    rid = request.match_info["rid"]
    out = await state.tokenizer_manager.wait_external(rid)
    return web.json_response(out)


async def handle_metrics(request: web.Request) -> web.Response:
    """Prometheus scrape endpoint. Scheduler gauges are pulled via the
    internal-state RPC at scrape time (no multiprocess registry needed)."""
    from prometheus_client import REGISTRY, generate_latest

    state: ServerState = request.app["state"]
    try:
        internal = await state.tokenizer_manager.get_internal_state()
        mc = request.app.get("sched_metrics")
        if mc is None:
            from iaas_sglang_tpu.metrics.collector import (
                SchedulerMetricsCollector,
                SchedulerStats,
            )

            mc = SchedulerMetricsCollector()
            request.app["sched_metrics"] = mc
        from iaas_sglang_tpu.metrics.collector import SchedulerStats

        total = max(internal.get("total_pages", 1), 1)
        mc.log_stats(SchedulerStats(
            num_running_reqs=internal.get("running", 0),
            num_waiting_reqs=internal.get("waiting", 0),
            token_usage=1.0 - internal.get("free_pages", 0) / total,
            num_retracted_reqs=internal.get("retracted", 0),
            cache_hit_rate=internal.get("cache_hit_rate", 0.0),
            spec_accept_length=internal.get("spec_accept_length", 0.0),
            num_grammar_reqs=internal.get("num_grammar_reqs", 0),
            num_disagg_pending_reqs=internal.get(
                "num_disagg_pending_reqs", 0),
        ))
    except Exception as e:
        logger.warning("metrics scrape: scheduler state unavailable: %s", e)
    return web.Response(
        body=generate_latest(), content_type="text/plain")


async def handle_v1_models(request: web.Request) -> web.Response:
    state: ServerState = request.app["state"]
    ml = ModelList(data=[ModelCard(id=state.server_args.served_model_name)])
    return web.json_response(ml.model_dump())


async def handle_chat_completions(request: web.Request) -> web.StreamResponse:
    state: ServerState = request.app["state"]
    tm = state.tokenizer_manager
    try:
        req = ChatCompletionRequest.model_validate(await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    if not req.messages:
        return web.json_response(
            {"error": {"message": "messages must be non-empty"}}, status=400)

    msgs = [
        {k: v for k, v in m.model_dump(exclude_none=True).items()
         if k in ("role", "content")}
        for m in req.messages
    ]
    # multimodal content parts: extract image_url payloads, flatten the
    # message content to its text parts (the MultimodalProcessor inserts
    # the image spans; reference: serving_chat image handling)
    image_data = []
    for m in msgs:
        c = m.get("content")
        if isinstance(c, list):
            texts = []
            for part in c:
                if part.get("type") == "image_url":
                    url = part.get("image_url")
                    image_data.append(
                        url.get("url") if isinstance(url, dict) else url)
                elif part.get("type") == "text":
                    texts.append(part.get("text", ""))
            m["content"] = "\n".join(texts)
    template_kwargs = {}
    if req.tools:
        template_kwargs["tools"] = [t.model_dump() for t in req.tools]
    named = state.server_args.chat_template
    if named or getattr(tm.tokenizer, "chat_template", None) is None:
        # named registry template (--chat-template, or the tokenizer ships
        # no jinja template; reference lang/chat_template.py)
        from iaas_sglang_tpu.conversation import get_chat_template

        tpl = get_chat_template(named or "chatml")
        prompt_ids = tm.tokenizer.encode(tpl.render(msgs))
    else:
        try:
            prompt_ids = tm.tokenizer.apply_chat_template(
                msgs, tokenize=True, add_generation_prompt=True,
                **template_kwargs,
            )
        except Exception:
            # template without tool support: fall back to plain messages
            prompt_ids = tm.tokenizer.apply_chat_template(
                msgs, tokenize=True, add_generation_prompt=True,
            )
    gri = GenerateReqInput(
        rid=uuid.uuid4().hex,
        input_ids=list(prompt_ids),
        sampling_params=req.to_sampling_params(),
        stream=req.stream,
        image_data=image_data or None,
    )
    model = req.model or state.server_args.served_model_name

    if not req.stream:
        out = await _collect_last(tm, gri)
        fin = out["meta_info"]["finish_reason"]
        text = out["text"]
        reasoning = None
        if req.separate_reasoning or state.server_args.reasoning_parser:
            from iaas_sglang_tpu.reasoning_parser import ReasoningParser

            style = (state.server_args.reasoning_parser
                     or req.reasoning_style)
            pr = ReasoningParser(style).parse_non_stream(text)
            reasoning, text = pr.reasoning_text or None, pr.normal_text
        tool_calls = None
        finish = map_finish_reason(fin)
        if req.tools and req.tool_choice != "none":
            from iaas_sglang_tpu.entrypoints.openai.protocol import (
                FunctionCallOut,
                ToolCall,
            )
            from iaas_sglang_tpu.function_call import FunctionCallParser

            parser = FunctionCallParser(req.tool_call_format)
            if parser.has_tool_call(text):
                text, calls = parser.parse_non_stream(text)
                if calls:
                    tool_calls = [
                        ToolCall(id=f"call_{uuid.uuid4().hex[:12]}",
                                 function=FunctionCallOut(
                                     name=c.name, arguments=c.parameters))
                        for c in calls
                    ]
                    finish = "tool_calls"
        resp = ChatCompletionResponse(
            model=model,
            choices=[ChatCompletionResponseChoice(
                index=0,
                message=ChatMessage(role="assistant", content=text or None,
                                    reasoning_content=reasoning,
                                    tool_calls=tool_calls),
                finish_reason=finish,
            )],
            usage=UsageInfo(
                prompt_tokens=out["meta_info"]["prompt_tokens"],
                completion_tokens=out["meta_info"]["completion_tokens"],
                total_tokens=out["meta_info"]["prompt_tokens"]
                + out["meta_info"]["completion_tokens"],
            ),
        )
        return web.json_response(resp.model_dump())

    resp = web.StreamResponse(headers={"Content-Type": "text/event-stream"})
    await resp.prepare(request)
    stream_id = f"chatcmpl-{uuid.uuid4().hex}"
    first = ChatCompletionStreamResponse(
        id=stream_id, model=model,
        choices=[ChatCompletionStreamChoice(
            index=0, delta=DeltaMessage(role="assistant", content=""))],
    )
    await resp.write(f"data: {first.model_dump_json()}\n\n".encode())
    sent = 0
    async for chunk in tm.generate_request(gri):
        delta = chunk["text"][sent:]
        sent = len(chunk["text"])
        fin = chunk["meta_info"]["finish_reason"]
        sc = ChatCompletionStreamResponse(
            id=stream_id, model=model,
            choices=[ChatCompletionStreamChoice(
                index=0, delta=DeltaMessage(content=delta),
                finish_reason=map_finish_reason(fin),
            )],
        )
        await resp.write(f"data: {sc.model_dump_json()}\n\n".encode())
    await resp.write(b"data: [DONE]\n\n")
    await resp.write_eof()
    return resp


async def handle_completions(request: web.Request) -> web.StreamResponse:
    state: ServerState = request.app["state"]
    tm = state.tokenizer_manager
    try:
        req = CompletionRequest.model_validate(await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    model = req.model or state.server_args.served_model_name

    prompts = req.prompt if isinstance(req.prompt, list) and \
        req.prompt and isinstance(req.prompt[0], (str, list)) else [req.prompt]

    async def run_one(p):
        if isinstance(p, str):
            from iaas_sglang_tpu.code_completion import apply_fim

            # FIM: a `suffix` request is rewritten into the model's
            # fill-in-the-middle prompt format (--completion-template)
            p = apply_fim(p, req.suffix)
            gri = GenerateReqInput(
                rid=uuid.uuid4().hex, text=p,
                sampling_params=req.to_sampling_params())
        else:
            gri = GenerateReqInput(
                rid=uuid.uuid4().hex, input_ids=p,
                sampling_params=req.to_sampling_params())
        return await _collect_last(tm, gri), (p if isinstance(p, str) else "")

    outs = await asyncio.gather(*[run_one(p) for p in prompts])
    choices, pt, ct = [], 0, 0
    for i, (out, echo_text) in enumerate(outs):
        text = out["text"]
        if req.echo:
            text = echo_text + text
        choices.append(CompletionResponseChoice(
            index=i, text=text,
            finish_reason=map_finish_reason(out["meta_info"]["finish_reason"]),
        ))
        pt += out["meta_info"]["prompt_tokens"]
        ct += out["meta_info"]["completion_tokens"]
    resp = CompletionResponse(
        model=model, choices=choices,
        usage=UsageInfo(prompt_tokens=pt, completion_tokens=ct,
                        total_tokens=pt + ct),
    )
    return web.json_response(resp.model_dump())


# ------------------------------------------------------------------- launch


async def handle_open_session(request: web.Request) -> web.Response:
    """HTTP surface of SessionController (reference http_server.py:630):
    returns the session id as a JSON string."""
    state: ServerState = request.app["state"]
    try:
        body = await request.json()
    except Exception:
        body = {}
    out = await state.tokenizer_manager.open_session(
        session_id=body.get("session_id"))
    if not out.success:
        return web.json_response(
            {"error": {"message": f"session {body.get('session_id')!r} "
                                  "could not be opened"}}, status=400)
    return web.json_response(out.session_id)


async def handle_close_session(request: web.Request) -> web.Response:
    """Reference http_server.py:644 analog."""
    state: ServerState = request.app["state"]
    body = await request.json()
    if "session_id" not in body:
        return web.json_response(
            {"error": {"message": "session_id required"}}, status=400)
    await state.tokenizer_manager.close_session(body["session_id"])
    return web.Response(status=200)


def build_app(server_args: ServerArgs, port_args: PortArgs,
              procs) -> web.Application:
    if server_args.completion_template:
        from iaas_sglang_tpu.code_completion import load_completion_template

        load_completion_template(server_args.completion_template)
    app = web.Application(middlewares=[error_middleware])
    tm = TokenizerManager(server_args, port_args)
    app["state"] = ServerState(server_args, port_args, tm, procs)
    app.router.add_get("/health", handle_health)
    app.router.add_get("/ping", handle_health)               # SageMaker
    app.router.add_post("/invocations", handle_sagemaker_invocations)
    import os as _os
    app.router.add_post(_os.environ.get("AIP_PREDICT_ROUTE",
                                        "/vertex_generate"),
                        handle_vertex_generate)               # Vertex AI
    app.router.add_get("/health_generate", handle_health_generate)
    app.router.add_get("/get_server_info", handle_get_server_info)
    app.router.add_get("/get_model_info", handle_get_model_info)
    app.router.add_post("/generate", handle_generate)
    app.router.add_post("/abort_request", handle_abort_request)
    app.router.add_post("/flush_cache", handle_flush_cache)
    app.router.add_post("/load_lora_adapter", handle_load_lora)
    app.router.add_post("/unload_lora_adapter", handle_unload_lora)
    app.router.add_post(
        "/{action:(update_weights_from_disk|init_weights_update_group|"
        "update_weights_from_distributed|save_sharded_model|"
        "save_remote_model|release_memory_occupation|"
        "resume_memory_occupation)}", handle_weight_rpc)
    app.router.add_post("/start_profile", handle_start_profile)
    app.router.add_post(
        "/{action:(start|stop|dump)_expert_distribution}_record",
        handle_expert_distribution)
    app.router.add_post("/eplb_rebalance", handle_eplb_rebalance)
    app.router.add_post("/stop_profile", handle_stop_profile)
    app.router.add_post("/open_session", handle_open_session)
    app.router.add_post("/close_session", handle_close_session)
    app.router.add_get("/disagg_wait/{rid}", handle_disagg_wait)
    app.router.add_get("/metrics", handle_metrics)
    app.router.add_get("/v1/models", handle_v1_models)
    app.router.add_post("/v1/chat/completions", handle_chat_completions)
    app.router.add_post("/v1/completions", handle_completions)
    app.router.add_post("/v1/embeddings", handle_embeddings)
    app.router.add_post("/v1/rerank", handle_rerank)
    app.router.add_post("/rerank", handle_rerank)
    app.router.add_post("/v1/score", handle_score)

    async def _startup_warmup(app_: web.Application) -> None:
        # health-generate warmup (the reference's _wait_and_warmup) plus
        # any named --warmups (srt/warmup.py analog)
        state = app_["state"]
        if state.server_args.skip_server_warmup:
            return
        from iaas_sglang_tpu.managers.io_struct import GenerateReqInput
        from iaas_sglang_tpu.warmup import execute_warmups

        gri = GenerateReqInput(
            input_ids=[1, 2, 3],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True})
        async for _ in state.tokenizer_manager.generate_request(gri):
            pass
        if state.server_args.warmups:
            await execute_warmups(state.server_args.warmups.split(","),
                                  state.tokenizer_manager)
        logger.info("warmup complete")

    app.on_startup.append(_startup_warmup)
    return app


async def handle_embeddings(request: web.Request) -> web.Response:
    """OpenAI /v1/embeddings (reference serving_embedding.py)."""
    state: ServerState = request.app["state"]
    body = await request.json()
    inp = body.get("input")
    if inp is None:
        return web.json_response({"error": "missing input"}, status=400)
    if isinstance(inp, str):
        texts, ids = [inp], None
    elif inp and isinstance(inp[0], int):
        texts, ids = None, [inp]
    elif inp and isinstance(inp[0], str):
        texts, ids = inp, None
    else:
        texts, ids = None, inp
    outs = await state.tokenizer_manager.embed_request(
        texts=texts, input_ids=ids)
    data = [
        {"object": "embedding", "index": i, "embedding": o["embedding"]}
        for i, o in enumerate(outs)
    ]
    total = sum(o["meta_info"]["prompt_tokens"] for o in outs)
    return web.json_response({
        "object": "list", "data": data,
        "model": body.get("model", state.server_args.served_model_name),
        "usage": {"prompt_tokens": total, "total_tokens": total},
    })


async def handle_rerank(request: web.Request) -> web.Response:
    """/v1/rerank (reference serving_rerank.py). With a classification-head
    model (cross-encoder, e.g. bge-reranker): score each (query, document)
    pair directly. Otherwise bi-encoder: embed query + documents and rank
    by cosine similarity."""
    import math

    state: ServerState = request.app["state"]
    body = await request.json()
    query = body.get("query")
    documents = body.get("documents")
    if not query or not documents:
        return web.json_response(
            {"error": "query and documents are required"}, status=400)

    if not hasattr(state, "_model_cfg"):
        from iaas_sglang_tpu.configs.model_config import ModelConfig

        try:
            state._model_cfg = ModelConfig.from_path(
                state.server_args.model_path)
        except Exception:
            state._model_cfg = None
    cfg = state._model_cfg
    if cfg is not None and cfg.num_labels:
        # cross-encoder: tokenize the pair, pooled score head = relevance
        tok = state.tokenizer_manager.tokenizer
        pair_ids = [tok(query, doc)["input_ids"] for doc in documents]
        outs = await state.tokenizer_manager.embed_request(
            input_ids=pair_ids)
        results = [
            {"score": float(outs[i]["embedding"][0]), "document": doc,
             "index": i, "meta_info": outs[i]["meta_info"]}
            for i, doc in enumerate(documents)
        ]
        results.sort(key=lambda r: r["score"], reverse=True)
        return web.json_response(results)

    outs = await state.tokenizer_manager.embed_request(
        texts=[query] + list(documents))
    qv = outs[0]["embedding"]
    qn = math.sqrt(sum(x * x for x in qv)) or 1.0

    def cos(dv):
        dn = math.sqrt(sum(x * x for x in dv)) or 1.0
        return sum(a * b for a, b in zip(qv, dv)) / (qn * dn)

    results = [
        {"score": cos(outs[i + 1]["embedding"]), "document": doc,
         "index": i, "meta_info": outs[i + 1]["meta_info"]}
        for i, doc in enumerate(documents)
    ]
    results.sort(key=lambda r: r["score"], reverse=True)
    return web.json_response(results)


async def handle_score(request: web.Request) -> web.Response:
    """/v1/score (reference serving_score.py ScoringRequest): label-token
    probabilities at the first generated position of query+item."""
    state: ServerState = request.app["state"]
    body = await request.json()
    try:
        scores = await state.tokenizer_manager.score_request(
            query=body.get("query"),
            items=body.get("items"),
            label_token_ids=body.get("label_token_ids"),
            apply_softmax=body.get("apply_softmax", False),
            item_first=body.get("item_first", False),
        )
    except ValueError as e:
        return web.json_response({"error": str(e)}, status=400)
    return web.json_response({
        "scores": scores,
        "model": body.get("model", state.server_args.served_model_name),
        "object": "scoring",
    })


def launch_server(server_args: ServerArgs) -> None:
    """Blocking server entry (analog of http_server.py:878 launch_server)."""
    configure_logger()
    port_args = PortArgs.init_new(server_args)
    procs = _launch_subprocesses(server_args, port_args)
    app = build_app(server_args, port_args, procs)
    try:
        web.run_app(
            app, host=server_args.host, port=server_args.port,
            print=lambda *a: logger.info(
                "server listening on %s:%d", server_args.host, server_args.port),
        )
    finally:
        for p in procs:
            p.terminate()
